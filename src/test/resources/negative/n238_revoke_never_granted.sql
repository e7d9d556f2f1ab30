-- reference: ql/src/test/queries/clientnegative/authorization_revoke_table_fail1.q
-- with the authorizer ON, revoking a privilege that was never granted is
-- the metastore's "no grant found" refusal.
-- ERROR-CONTAINS: Cannot find privilege to revoke
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_revfail;
CREATE TABLE graft_tmp.neg_revfail (i INT) USING parquet;
set hive.security.authorization.enabled=true;
REVOKE SELECT ON TABLE graft_tmp.neg_revfail FROM ROLE public;
