-- reference: ql/src/test/queries/clientnegative/authorization_fail_1.q —
-- granting the SAME privilege twice under enforcement surfaces the
-- metastore's primary-key violation ("... is already granted on table").
-- ERROR-CONTAINS: already granted
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_dg;
CREATE TABLE graft_tmp.neg_auth_dg (k INT) USING parquet;
set hive.security.authorization.enabled=true;
GRANT CREATE ON TABLE graft_tmp.neg_auth_dg TO ROLE public;
GRANT CREATE ON TABLE graft_tmp.neg_auth_dg TO ROLE public;
