SELECT o_orderkey, nullif(o_orderstatus, 'O') AS s FROM orders
WHERE o_orderkey < 60
