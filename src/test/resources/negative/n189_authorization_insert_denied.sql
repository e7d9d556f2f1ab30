-- legacy provider (Driver.doAuthorization): INSERT needs an Insert
-- grant on the output table — a Select-only grant does not cover it.
-- ERROR-CONTAINS: No privilege 'Insert' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_ins;
CREATE TABLE graft_tmp.neg_auth_ins (k INT) USING parquet;
set hive.security.authorization.enabled=true;
GRANT SELECT ON TABLE graft_tmp.neg_auth_ins TO ROLE public;
INSERT INTO graft_tmp.neg_auth_ins VALUES (1);
