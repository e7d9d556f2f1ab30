-- reference: ql/src/test/queries/clientnegative/authorization_not_owner_drop_view.q
-- DROP VIEW is ownership-gated the same way as DROP TABLE.
-- ERROR-CONTAINS: DROPVIEW [[OBJECT OWNERSHIP]
CREATE DATABASE IF NOT EXISTS graft_tmp;
set user.name=user1;
DROP VIEW IF EXISTS graft_tmp.neg_nodropv;
DROP TABLE IF EXISTS graft_tmp.neg_nodropv_t;
CREATE TABLE graft_tmp.neg_nodropv_t (i INT) USING parquet;
CREATE VIEW graft_tmp.neg_nodropv AS SELECT i FROM graft_tmp.neg_nodropv_t;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=user2;
DROP VIEW graft_tmp.neg_nodropv;
