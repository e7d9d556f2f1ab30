-- reference: ql/src/test/queries/clientnegative/drop_view_failure2.q —
-- DROP VIEW against a TABLE is a type mismatch, not a drop.
-- ERROR-CONTAINS: WRONG_COMMAND_FOR_OBJECT_TYPE | Cannot drop a table with DROP VIEW | is not a view
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_dv1;
CREATE TABLE graft_tmp.neg_dv1 (k INT) USING parquet;
DROP VIEW graft_tmp.neg_dv1;
