-- limit_pushdown.q: ordered limit under a join, limit over ordered union
SELECT t.o_orderkey, n.n_name FROM
  (SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 20) t
JOIN customer c ON t.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
