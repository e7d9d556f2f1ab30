-- reference: SQLStdHiveAccessController getCurrentRoleNames — privileges
-- flow only through ACTIVE roles: the user's select grant arrives via
-- neg287_r, so after SET ROLE NONE (public only) the select is refused.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg287_t;
CREATE TABLE graft_tmp.neg287_t (i INT) USING parquet;
CREATE ROLE neg287_r;
GRANT ROLE neg287_r TO USER neg287_user;
GRANT SELECT ON TABLE graft_tmp.neg287_t TO ROLE neg287_r;
set user.name=neg287_user;
set hive.security.authorization.enabled=true;
SET ROLE NONE;
SELECT i FROM graft_tmp.neg287_t;
