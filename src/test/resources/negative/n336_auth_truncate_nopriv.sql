-- reference: ql/src/test/queries/clientnegative/authorization_truncate.q
-- — TRUNCATE of another user's table refuses under the SQL-std
-- authorizer (truncate requires ownership/DROP-level rights).
-- ERROR-CONTAINS: privilege | owner
DROP TABLE IF EXISTS neg336_t;
CREATE TABLE neg336_t (i INT, j INT) USING parquet;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set hive.security.authorization.enabled=true;
set user.name=neg336_user1;
TRUNCATE TABLE neg336_t;
