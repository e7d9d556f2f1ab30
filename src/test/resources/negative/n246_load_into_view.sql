-- reference: ql/src/test/queries/clientnegative/load_view_failure.q
-- LOAD DATA into a VIEW is refused — a view has no storage to move
-- files into.
-- ERROR-CONTAINS: is a view | expects a table | into a view | not allowed
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_loadview;
DROP TABLE IF EXISTS graft_tmp.neg_loadview_t;
CREATE TABLE graft_tmp.neg_loadview_t (key INT) USING parquet;
CREATE VIEW graft_tmp.neg_loadview AS SELECT key FROM graft_tmp.neg_loadview_t;
LOAD DATA LOCAL INPATH '${NEGTMP}/nofile.parquet' INTO TABLE graft_tmp.neg_loadview;
