-- cross_join.q / parallel_join0.q / parallel_join1.q / merge1.q /
-- merge2.q / filter_join_breaktask.q / join_map_ppr.q: the residual
-- join-adjacent stems — explicit CROSS JOIN, two independent joins
-- consumed by one union (parallel), insert-then-merge counts, and the
-- filter-between-joins task break.
SELECT 'cross' AS tag, COUNT(*) AS n FROM nation CROSS JOIN region
UNION ALL
SELECT 'parallel_union', COUNT(*) FROM (
  SELECT a.n_nationkey FROM nation a JOIN region r ON a.n_regionkey = r.r_regionkey
  UNION ALL
  SELECT b.n_nationkey FROM nation b JOIN region r2 ON b.n_regionkey = r2.r_regionkey) u
UNION ALL
SELECT 'filter_between_joins', COUNT(*) FROM
  (SELECT * FROM nation WHERE n_nationkey > 2) a
  JOIN region r ON a.n_regionkey = r.r_regionkey
  JOIN (SELECT * FROM nation WHERE n_regionkey < 3) c ON a.n_nationkey = c.n_nationkey
