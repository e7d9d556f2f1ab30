-- legacy provider: the CoW UPDATE is a write needing an Update grant on
-- the table — Select+Insert do not cover it (privilege kinds are
-- checked individually, Privilege.java's distinct actions).
-- ERROR-CONTAINS: No privilege 'Update' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_up;
CREATE TABLE graft_tmp.neg_auth_up (k INT) USING parquet;
INSERT INTO graft_tmp.neg_auth_up VALUES (1);
set hive.security.authorization.enabled=true;
GRANT SELECT ON TABLE graft_tmp.neg_auth_up TO ROLE public;
GRANT INSERT ON TABLE graft_tmp.neg_auth_up TO ROLE public;
UPDATE graft_tmp.neg_auth_up SET k = 2 WHERE k = 1;
