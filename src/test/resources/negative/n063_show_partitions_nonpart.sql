-- reference: ql/src/test/queries/clientnegative/show_partitions1.q
-- SHOW PARTITIONS demands a partitioned table
-- ERROR-CONTAINS: INVALID_PARTITION_OPERATION | not partitioned | NOT_ALLOWED
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_sp;
CREATE TABLE graft_tmp.neg_sp (a INT) USING parquet LOCATION '${NEGTMP}/neg_sp';
SHOW PARTITIONS graft_tmp.neg_sp;
