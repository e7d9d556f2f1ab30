SELECT v, count(*) AS n FROM (
  SELECT CAST(n_nationkey AS INT) AS v FROM nation
  UNION ALL
  SELECT CAST(r_regionkey AS DOUBLE) AS v FROM region
  UNION ALL
  SELECT 2.5 AS v) t
GROUP BY v
