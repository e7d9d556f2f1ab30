SELECT a.o_orderkey, b.o_orderkey AS bk
FROM (SELECT o_orderkey, nullif(o_orderstatus,'P') AS s FROM orders WHERE o_orderkey < 100) a
LEFT JOIN (SELECT o_orderkey, nullif(o_orderstatus,'P') AS s FROM orders WHERE o_orderkey < 100) b
ON a.s = b.s AND a.o_orderkey = b.o_orderkey
