-- reference: ql/src/test/queries/clientnegative/authorization_invalid_priv_v2.q
-- — GRANT INDEX under the SQL-std authorizer refuses: only
-- SELECT/INSERT/UPDATE/DELETE/ALL are grantable privileges there.
-- ERROR-CONTAINS: index | unsupported privilege | not a grantable
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set hive.security.authorization.enabled=true;
DROP TABLE IF EXISTS neg334_t;
CREATE TABLE neg334_t (key INT, value STRING) USING parquet;
GRANT INDEX ON TABLE neg334_t TO USER neg334_user;
