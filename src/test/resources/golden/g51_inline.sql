SELECT o_orderkey, t.tag, t.v
FROM orders
LATERAL VIEW inline(array(
  named_struct('tag', 'lo', 'v', o_custkey),
  named_struct('tag', 'hi', 'v', o_custkey * 10))) t AS tag, v
WHERE o_orderkey < 30
