-- reference: ql/src/test/queries/clientnegative/alter_partition_change_col_nonexist.q
-- — CHANGE COLUMN must name an existing column.
-- ERROR-CONTAINS: no column
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_chg1;
CREATE TABLE graft_tmp.neg_chg1 (a INT, b STRING) USING parquet;
ALTER TABLE graft_tmp.neg_chg1 CHANGE COLUMN nosuch newname INT;
