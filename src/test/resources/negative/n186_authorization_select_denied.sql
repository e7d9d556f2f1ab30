-- reference: ql/src/test/queries/clientnegative/authorization_fail_7.q —
-- with hive.security.authorization.enabled=true a SELECT needs a Select
-- grant reaching the user; here the only grant rode a role that was
-- dropped, so the read is refused.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_sel;
CREATE TABLE graft_tmp.neg_auth_sel (k INT, v STRING) USING parquet;
set hive.security.authorization.enabled=true;
CREATE ROLE neg_auth_role;
GRANT SELECT ON TABLE graft_tmp.neg_auth_sel TO ROLE neg_auth_role;
DROP ROLE neg_auth_role;
SELECT k FROM graft_tmp.neg_auth_sel;
