-- ppd_gby.q / ppd_union.q: predicates over group-by and union subqueries
-- (pushed below by the optimizer; results must equal the unpushed form).
SELECT src, k, n FROM (
  SELECT 'g' AS src, n_regionkey AS k, count(*) AS n
  FROM nation GROUP BY n_regionkey
  UNION ALL
  SELECT 'u', r_regionkey, 1 FROM region
) t
WHERE k > 1 AND n >= 1
ORDER BY src, k;
