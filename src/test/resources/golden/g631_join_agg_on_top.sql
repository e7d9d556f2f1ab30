-- join40.q / join41.q: LEFT OUTER over a LIMITed-subquery side and an
-- aggregate over the join; limit side pinned deterministic by ordering.
SELECT 'outer_limited' AS tag, COUNT(*) AS n, SUM(COALESCE(b.k, -1)) AS s FROM
  nation a LEFT OUTER JOIN
  (SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey LIMIT 5) b
  ON a.n_nationkey = b.k
UNION ALL
SELECT 'agg_over_join', COUNT(DISTINCT a.n_regionkey), SUM(b.r_regionkey)
FROM nation a JOIN region b ON a.n_regionkey = b.r_regionkey
