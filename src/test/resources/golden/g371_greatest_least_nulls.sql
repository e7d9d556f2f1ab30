-- udf_greatest.q/udf_least.q null semantics (HIVE-12082): any NULL
-- argument makes the result NULL; Spark's natives skip nulls instead
SELECT n_nationkey,
  greatest(n_nationkey, n_regionkey, 7) AS g,
  least(n_nationkey, n_regionkey, 7) AS l,
  greatest(n_nationkey, CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END) AS g_null,
  least(n_nationkey, CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END) AS l_null,
  greatest(n_name, 'NATION_5') AS g_str
FROM nation WHERE n_nationkey < 9
