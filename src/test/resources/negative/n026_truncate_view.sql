-- reference: ql/src/test/queries/clientnegative/truncate_partition_column.q (truncate-target family)
-- ERROR-CONTAINS: EXPECT_TABLE_NOT_VIEW | on a view | not allowed on a view
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_truncv;
CREATE VIEW graft_tmp.neg_truncv AS SELECT 1 AS k;
TRUNCATE TABLE graft_tmp.neg_truncv;
