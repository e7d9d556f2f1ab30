-- reference: ql/src/test/queries/clientpositive/drop_multi_partitions.q
-- — DROP PARTITION with a PARTIAL spec (b='1') removes every matching
-- (b,c) partition; DROP IF EXISTS on a missing spec is a no-op.
CREATE DATABASE IF NOT EXISTS g1130_dmp;
DROP TABLE IF EXISTS g1130_dmp.mp;
CREATE TABLE g1130_dmp.mp (a STRING)
  PARTITIONED BY (b STRING, c STRING) STORED AS PARQUET;
ALTER TABLE g1130_dmp.mp ADD PARTITION (b='1', c='1');
ALTER TABLE g1130_dmp.mp ADD PARTITION (b='1', c='2');
ALTER TABLE g1130_dmp.mp ADD PARTITION (b='2', c='2');
ALTER TABLE g1130_dmp.mp DROP PARTITION (b='1');
ALTER TABLE g1130_dmp.mp DROP IF EXISTS PARTITION (b='3');
SHOW PARTITIONS g1130_dmp.mp
