-- ppd_gby_join.q, ppd_join.q, ppd_join3.q, ppd_join5.q,
-- ppd_join_filter.q, ppd_outer_join2.q, ppd_outer_join3.q,
-- ppd_outer_join4.q, ppd_outer_join5.q, join_cond_pushdown_4.q,
-- join_cond_pushdown_unqual3.q, join_cond_pushdown_unqual4.q:
-- pushdown through GROUP BY + join, filters on UNQUALIFIED columns,
-- and the right/full outer pushdown asymmetry.
SELECT 'gby_join' AS tag, COUNT(*) AS n FROM
  (SELECT n_regionkey, COUNT(*) AS c FROM nation GROUP BY n_regionkey HAVING COUNT(*) > 3) g
  JOIN region r ON g.n_regionkey = r.r_regionkey
  WHERE r.r_regionkey < 4
UNION ALL
SELECT 'unqual_cols', COUNT(*) FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE n_nationkey < 10 AND r_name LIKE '%A%'
UNION ALL
SELECT 'router_where_nullside', COUNT(*) FROM
  nation a RIGHT OUTER JOIN region b ON a.n_regionkey = b.r_regionkey AND a.n_nationkey < 5
  WHERE a.n_nationkey IS NULL
UNION ALL
SELECT 'fouter_on_both', COUNT(*) FROM
  nation a FULL OUTER JOIN region b
  ON a.n_regionkey = b.r_regionkey AND a.n_nationkey < 5 AND b.r_regionkey > 1
