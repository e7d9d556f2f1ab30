-- join_cond_pushdown_1.q: non-equi residual predicates inside ON vs
-- WHERE for inner joins are equivalent; pin both give the same rows.
SELECT 'on_residual' AS tag, COUNT(*) AS n FROM nation n
  JOIN region r ON n.n_regionkey = r.r_regionkey AND n.n_nationkey > r.r_regionkey * 3
UNION ALL
SELECT 'where_residual', COUNT(*) FROM nation n
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE n.n_nationkey > r.r_regionkey * 3
