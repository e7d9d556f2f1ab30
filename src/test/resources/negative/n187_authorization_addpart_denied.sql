-- reference: ql/src/test/queries/clientnegative/authorization_fail_2.q —
-- ALTER TABLE ... ADD PARTITION under enforcement needs a Create grant
-- on the TABLE; even the creating user is denied until granted (the
-- legacy provider has no implicit owner-gets-all).
-- ERROR-CONTAINS: No privilege 'Create' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_ap;
CREATE TABLE graft_tmp.neg_auth_ap (k INT, ds STRING) USING parquet PARTITIONED BY (ds);
set hive.security.authorization.enabled=true;
ALTER TABLE graft_tmp.neg_auth_ap ADD PARTITION (ds='2010');
