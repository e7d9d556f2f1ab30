-- reference: ql/src/test/queries/clientnegative/authorization_grant_table_dup.q
-- with the authorizer ON a duplicate grant is the metastore's primary-key
-- violation surfaced as an error.
-- ERROR-CONTAINS: already granted
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_gdup;
CREATE TABLE graft_tmp.neg_gdup (i INT) USING parquet;
set hive.security.authorization.enabled=true;
GRANT SELECT ON TABLE graft_tmp.neg_gdup TO ROLE public;
GRANT SELECT ON TABLE graft_tmp.neg_gdup TO ROLE public;
