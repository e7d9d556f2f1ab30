-- reference: ql/src/test/queries/clientpositive/drop_table.q +
-- drop_table2.q + drop_view.q + drop_udf.q + drop_function.q +
-- database_drop.q + database_location.q +
-- ctas_uses_database_location.q — DROP across object kinds: a
-- partitioned table (partitions go with it), a view, a temporary
-- function, and a database created WITH LOCATION whose CTAS tables
-- land under it.
DROP DATABASE IF EXISTS g1170_db CASCADE;
CREATE DATABASE g1170_db LOCATION '${GOLDTMP}/g1170_db_loc';
CREATE TABLE g1170_db.inside AS
  SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 4;
DROP TABLE IF EXISTS g1170_pt;
CREATE TABLE g1170_pt (a INT) PARTITIONED BY (ds STRING) STORED AS PARQUET;
ALTER TABLE g1170_pt ADD PARTITION (ds='1');
ALTER TABLE g1170_pt ADD PARTITION (ds='2');
DROP TABLE g1170_pt;
CREATE VIEW g1170_v AS SELECT 1 AS one;
DROP VIEW g1170_v;
CREATE TEMPORARY FUNCTION g1170_fn AS 'org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper';
DROP TEMPORARY FUNCTION g1170_fn;
SELECT (SELECT count(*) FROM g1170_db.inside) AS n_inside
