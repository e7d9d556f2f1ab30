-- reference: ql/src/test/queries/clientpositive/inputddl6.q — DESCRIBE
-- EXTENDED on table and partition, SHOW PARTITIONS before and after an
-- ALTER TABLE ... DROP PARTITION.
DROP TABLE IF EXISTS g1040_ddl6;
CREATE TABLE g1040_ddl6 (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT INTO g1040_ddl6 PARTITION (ds='2008-04-09')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation;
INSERT INTO g1040_ddl6 PARTITION (ds='2008-04-08')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation;
DESCRIBE EXTENDED g1040_ddl6;
DESCRIBE EXTENDED g1040_ddl6 PARTITION (ds='2008-04-08');
SHOW PARTITIONS g1040_ddl6;
ALTER TABLE g1040_ddl6 DROP PARTITION (ds='2008-04-08');
SHOW PARTITIONS g1040_ddl6;
