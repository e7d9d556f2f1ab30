-- reference: ql/src/test/queries/clientpositive/alter_rename_table.q —
-- ALTER TABLE ... RENAME TO across DATABASES: a plain table, a
-- partitioned table (partitions travel), and a rename that changes the
-- table name too.
CREATE DATABASE IF NOT EXISTS g1084_source;
CREATE DATABASE IF NOT EXISTS g1084_target;
DROP TABLE IF EXISTS g1084_source.src;
DROP TABLE IF EXISTS g1084_target.src;
DROP TABLE IF EXISTS g1084_source.srcpart;
DROP TABLE IF EXISTS g1084_target.srcpart;
DROP TABLE IF EXISTS g1084_source.src1;
DROP TABLE IF EXISTS g1084_target.renamed1;
CREATE TABLE g1084_source.src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, n_name AS value FROM nation;
SET hive.exec.dynamic.partition=true;
SET hive.exec.dynamic.partition.mode=nonstrict;
CREATE TABLE g1084_source.srcpart (key INT)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1084_source.srcpart PARTITION (ds)
  SELECT CAST(n_nationkey AS INT), concat('d', n_regionkey) FROM nation;
ALTER TABLE g1084_source.src RENAME TO g1084_target.src;
ALTER TABLE g1084_source.srcpart RENAME TO g1084_target.srcpart;
CREATE TABLE g1084_source.src1 USING parquet AS
  SELECT 42 AS key, 'renamed' AS value;
ALTER TABLE g1084_source.src1 RENAME TO g1084_target.renamed1;
SELECT (SELECT count(*) FROM g1084_target.src) AS n_src,
       (SELECT count(DISTINCT ds) FROM g1084_target.srcpart) AS n_parts,
       (SELECT sum(key) FROM g1084_target.srcpart) AS sum_part_keys,
       (SELECT value FROM g1084_target.renamed1) AS renamed_value
