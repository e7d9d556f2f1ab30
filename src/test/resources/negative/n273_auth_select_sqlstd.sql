-- reference: ql/src/test/queries/clientnegative/authorization_select.q
-- Under the SQL-std authorizer a different user with no grant (and no
-- ownership) cannot SELECT from the table.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
set user.name=owner1;
DROP TABLE IF EXISTS graft_tmp.neg_authsel;
CREATE TABLE graft_tmp.neg_authsel (i INT) USING parquet;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=user1;
SELECT * FROM graft_tmp.neg_authsel;
