-- reference: ql/src/test/queries/clientnegative/alter_partition_invalidspec.q
-- ALTER TABLE ... PARTITION with a PARTIAL spec (missing trailing key)
-- is refused for partition-addressed DDL.
-- ERROR-CONTAINS: Partition spec is invalid | PARTITIONS_NOT_FOUND | partition spec | not found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_invspec;
CREATE TABLE graft_tmp.neg_invspec (key STRING)
  USING parquet PARTITIONED BY (year STRING, month STRING);
INSERT INTO graft_tmp.neg_invspec PARTITION (year='1996', month='10') VALUES ('a');
ALTER TABLE graft_tmp.neg_invspec PARTITION (year='1997') RENAME TO PARTITION (year='1998');
