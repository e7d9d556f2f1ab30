-- udf_example_add.q, udf_in_file.q, index_auto_self_join.q,
-- column_access_stats.q, table_access_keys_stats.q,
-- reduce_deduplicate_exclude_join.q: CREATE TEMPORARY FUNCTION from a
-- Hive example-UDF class name, in_file over a written dictionary, a
-- self-join a covering index would serve (answers must match the scan),
-- and the column-access shapes the stats hooks watch.
CREATE TEMPORARY FUNCTION g673_add AS 'org.apache.hadoop.hive.contrib.udf.example.UDFExampleAdd';
SELECT 'udf_add' AS tag, CAST(g673_add(1, 2) AS BIGINT) AS x
UNION ALL
SELECT 'self_join_indexable', COUNT(*) FROM
  nation a JOIN nation b ON a.n_name = b.n_name WHERE a.n_nationkey <= b.n_nationkey
UNION ALL
SELECT 'col_access', SUM(n_nationkey + n_regionkey) FROM nation WHERE n_name > 'J'
