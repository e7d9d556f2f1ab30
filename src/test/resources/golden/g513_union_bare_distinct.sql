-- union_distinct.q: bare UNION = UNION DISTINCT in HiveQL — duplicates
-- across branches collapse; UNION ALL in the same query keeps them.
SELECT 'dist' AS tag, cast(x AS STRING) AS v FROM (
  SELECT n_regionkey AS x FROM nation
  UNION
  SELECT r_regionkey AS x FROM region
) u
UNION ALL
SELECT 'all', cast(y AS STRING) FROM (
  SELECT n_regionkey AS y FROM nation WHERE n_nationkey < 3
  UNION ALL
  SELECT r_regionkey AS y FROM region WHERE r_regionkey < 1
) w
