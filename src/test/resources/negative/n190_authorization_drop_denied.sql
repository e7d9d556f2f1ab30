-- legacy provider: DROP TABLE needs a Drop grant on the table under
-- enforcement (clientnegative authorization family).
-- ERROR-CONTAINS: No privilege 'Drop' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_drop;
CREATE TABLE graft_tmp.neg_auth_drop (k INT) USING parquet;
set hive.security.authorization.enabled=true;
DROP TABLE graft_tmp.neg_auth_drop;
