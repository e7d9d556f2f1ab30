-- reference: ql/src/test/queries/clientnegative/authorization_not_owner_drop_tab.q
-- Under the SQL-std authorizer DROP TABLE is ownership-gated: user2 did
-- not create t and is not admin, so the drop is refused.
-- ERROR-CONTAINS: DROPTABLE [[OBJECT OWNERSHIP]
CREATE DATABASE IF NOT EXISTS graft_tmp;
set user.name=user1;
DROP TABLE IF EXISTS graft_tmp.neg_nodrop;
CREATE TABLE graft_tmp.neg_nodrop (i INT) USING parquet;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=user2;
DROP TABLE graft_tmp.neg_nodrop;
