DROP TEMPORARY FUNCTION IF EXISTS g148_field;
CREATE TEMPORARY FUNCTION g148_field AS 'org.apache.hadoop.hive.ql.udf.generic.GenericUDFField';
SELECT n_nationkey, g148_field(n_name, 'NATION_3', 'NATION_5', 'NATION_7') AS f
FROM nation WHERE n_nationkey < 8
