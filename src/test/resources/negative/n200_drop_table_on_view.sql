-- reference: ql/src/test/queries/clientnegative/drop_table_failure3-shape
-- (the inverse of drop_view_failure2): DROP TABLE against a VIEW refuses.
-- ERROR-CONTAINS: WRONG_COMMAND_FOR_OBJECT_TYPE | Cannot drop a view with DROP TABLE | is not a table
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_dt_v;
CREATE VIEW graft_tmp.neg_dt_v AS SELECT 1 AS one;
DROP TABLE graft_tmp.neg_dt_v;
