-- reference: ql/src/test/queries/clientnegative/authorization_not_owner_alter_tab_rename.q
-- ALTER TABLE ... RENAME is ownership-gated under the SQL-std
-- authorizer.
-- ERROR-CONTAINS: ALTERTABLE_RENAME [[OBJECT OWNERSHIP]
CREATE DATABASE IF NOT EXISTS graft_tmp;
set user.name=user1;
DROP TABLE IF EXISTS graft_tmp.neg_noren;
DROP TABLE IF EXISTS graft_tmp.neg_noren2;
CREATE TABLE graft_tmp.neg_noren (i INT) USING parquet;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=user2;
ALTER TABLE graft_tmp.neg_noren RENAME TO graft_tmp.neg_noren2;
