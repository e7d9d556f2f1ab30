-- reference: ql/src/test/queries/clientpositive/authorization_1.q's
-- refusal half (and authorization_fail_7.q's columnName-carrying error):
-- a column-scoped Select grant does not cover reads touching other
-- columns.
-- ERROR-CONTAINS: columnName:value
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_col;
CREATE TABLE graft_tmp.neg_auth_col (key INT, value STRING) USING parquet;
set hive.security.authorization.enabled=true;
GRANT SELECT(key) ON TABLE graft_tmp.neg_auth_col TO ROLE public;
SELECT key, value FROM graft_tmp.neg_auth_col;
