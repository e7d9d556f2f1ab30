-- union_null.q / unionall battery: NULL literals unioned against typed
-- columns take the column's type; mixed int/double branches widen.
SELECT 'strs' AS tag, x AS v FROM (
  SELECT n_name AS x FROM nation WHERE n_nationkey < 3
  UNION ALL
  SELECT NULL AS x FROM nation WHERE n_nationkey < 2
) u
UNION ALL
SELECT 'nums', cast(y AS STRING) FROM (
  SELECT n_nationkey AS y FROM nation WHERE n_nationkey < 3
  UNION ALL
  SELECT n_nationkey / 2.0 AS y FROM nation WHERE n_nationkey BETWEEN 3 AND 4
) w
