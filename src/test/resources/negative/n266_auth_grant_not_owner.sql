-- reference: ql/src/test/queries/clientnegative/authorization_grant_table_fail1.q
-- user2 neither owns the table nor holds any grant on it — a GRANT as
-- user2 is refused under the SQL-std authorizer.
-- ERROR-CONTAINS: GRANT_PRIVILEGE [[INSERT with grant]
CREATE DATABASE IF NOT EXISTS graft_tmp;
set user.name=user1;
DROP TABLE IF EXISTS graft_tmp.neg_gfail1;
CREATE TABLE graft_tmp.neg_gfail1 (i INT) USING parquet;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=user2;
GRANT INSERT ON TABLE graft_tmp.neg_gfail1 TO USER user3;
