-- reference: ql/src/test/queries/clientnegative/create_view_failure2.q
-- views and tables share one namespace
-- ERROR-CONTAINS: TABLE_OR_VIEW_ALREADY_EXISTS | already exists
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_xxx4;
DROP TABLE IF EXISTS graft_tmp.neg_xxx4;
CREATE VIEW graft_tmp.neg_xxx4 AS SELECT 1 AS key;
CREATE TABLE graft_tmp.neg_xxx4 (key INT) USING parquet LOCATION '${NEGTMP}/neg_xxx4';
