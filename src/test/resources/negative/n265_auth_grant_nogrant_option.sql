-- reference: ql/src/test/queries/clientnegative/authorization_grant_table_fail_nogrant.q
-- Under the SQL-std authorizer a GRANT needs the grantor to be admin,
-- the object's owner, or a holder of that privilege WITH GRANT OPTION.
-- user2 holds plain INSERT (no grant option) and cannot re-grant it.
-- ERROR-CONTAINS: GRANT_PRIVILEGE [[INSERT with grant]
CREATE DATABASE IF NOT EXISTS graft_tmp;
set user.name=user1;
DROP TABLE IF EXISTS graft_tmp.neg_gfail_ng;
CREATE TABLE graft_tmp.neg_gfail_ng (i INT) USING parquet;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
GRANT INSERT ON TABLE graft_tmp.neg_gfail_ng TO USER user2;
set user.name=user2;
GRANT INSERT ON TABLE graft_tmp.neg_gfail_ng TO USER user3;
