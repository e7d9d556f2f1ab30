-- reference: ql/src/test/queries/clientnegative/alter_view_failure.q
-- ALTER TABLE ... REPLACE COLUMNS against a VIEW is refused — a view
-- has no storage schema to replace.
-- ERROR-CONTAINS: is a view | expects a table | EXPECT_TABLE_NOT_VIEW
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_replview;
DROP TABLE IF EXISTS graft_tmp.neg_replview_t;
CREATE TABLE graft_tmp.neg_replview_t (key INT) USING parquet;
CREATE VIEW graft_tmp.neg_replview AS SELECT key FROM graft_tmp.neg_replview_t;
ALTER TABLE graft_tmp.neg_replview REPLACE COLUMNS (xyz INT);
