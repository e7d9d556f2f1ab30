-- union6.q..union11.q: unions mixing scalar-subquery branches, constant
-- branches and table branches (the "map-only + reduce" mixed DAG).
SELECT 'mixed' AS tag, k, n FROM (
  SELECT 'const' AS k, 1 AS n
  UNION ALL
  SELECT 'scalar', (SELECT COUNT(*) FROM region)
  UNION ALL
  SELECT n_name, n_nationkey FROM nation WHERE n_nationkey < 3) u
