-- reference: ql/src/test/queries/clientnegative/authorization_fail_7.q
-- Privileges granted TO A ROLE die with the role: after DROP ROLE the
-- user who held the grant through it is refused.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg298_t;
CREATE TABLE graft_tmp.neg298_t (key INT, value STRING) USING parquet;
set hive.security.authorization.enabled=true;
CREATE ROLE neg298_role;
GRANT ROLE neg298_role TO USER neg298_user;
GRANT SELECT ON TABLE graft_tmp.neg298_t TO ROLE neg298_role;
DROP ROLE neg298_role;
set user.name=neg298_user;
SELECT key FROM graft_tmp.neg298_t;
