-- reference: ql/src/test/queries/clientnegative/truncate_partition_column.q (truncate-target family)
-- a PARTITION spec on an unpartitioned (managed) table is refused
-- ERROR-CONTAINS: PARTITION_SCHEMA_IS_EMPTY | not partitioned | INVALID_PARTITION
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_tpc_m;
CREATE TABLE graft_tmp.neg_tpc_m (a INT) USING parquet;
TRUNCATE TABLE graft_tmp.neg_tpc_m PARTITION (p='1');
