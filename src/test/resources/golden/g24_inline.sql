SELECT o_orderkey, a, b FROM orders
LATERAL VIEW inline(array(struct(o_orderstatus, o_orderpriority))) t AS a, b
WHERE o_orderkey < 20
