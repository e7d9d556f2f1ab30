-- ppd_join1.q..ppd_join4.q + ppd_outer_join1.q..5.q: predicate pushdown
-- through inner joins (WHERE on either side pushes) and the outer-join
-- asymmetry — a WHERE on the preserved side pushes, on the null-supplied
-- side it converts the join; results pinned for both.
SELECT 'inner_pushed' AS tag, COUNT(*) AS n FROM
  nation a JOIN region b ON a.n_regionkey = b.r_regionkey
  WHERE a.n_nationkey < 10 AND b.r_regionkey < 4
UNION ALL
SELECT 'outer_preserved_side', COUNT(*) FROM
  nation a LEFT OUTER JOIN region b ON a.n_regionkey = b.r_regionkey AND b.r_name LIKE 'A%'
  WHERE a.n_nationkey < 10
UNION ALL
SELECT 'outer_nullside_where_converts', COUNT(*) FROM
  nation a LEFT OUTER JOIN region b ON a.n_regionkey = b.r_regionkey
  WHERE b.r_name LIKE 'A%'
