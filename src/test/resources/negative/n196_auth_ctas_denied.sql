-- reference: ql/src/test/queries/clientnegative/authorization_ctas.q —
-- CTAS under enforcement needs Select on the source table.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_src;
DROP TABLE IF EXISTS graft_tmp.neg_auth_ct;
CREATE TABLE graft_tmp.neg_auth_src (k INT) USING parquet;
set hive.security.authorization.enabled=true;
CREATE TABLE graft_tmp.neg_auth_ct USING parquet AS SELECT k FROM graft_tmp.neg_auth_src;
