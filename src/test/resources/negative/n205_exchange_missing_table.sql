-- reference: ql/src/test/queries/clientnegative/exchange_partition_neg_table_missing.q
-- — EXCHANGE PARTITION with a nonexistent source table.
-- ERROR-CONTAINS: TABLE_OR_VIEW_NOT_FOUND | not found | does not exist
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_ex_dst;
CREATE TABLE graft_tmp.neg_ex_dst (k INT, ds STRING) USING parquet PARTITIONED BY (ds);
ALTER TABLE graft_tmp.neg_ex_dst EXCHANGE PARTITION (ds='d1') WITH TABLE graft_tmp.neg_ex_nosuch;
