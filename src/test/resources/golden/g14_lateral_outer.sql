SELECT o_orderkey, x FROM orders
LATERAL VIEW OUTER explode(CASE WHEN o_orderkey % 2 = 0 THEN array(o_orderstatus) ELSE array() END) t AS x
WHERE o_orderkey < 30
