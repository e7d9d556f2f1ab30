-- reference: ql/src/test/queries/clientnegative/
-- authorization_not_owner_drop_tab2.q — DROP through the db.table syntax
-- is ownership-gated the same as an unqualified drop: user2 cannot drop
-- user1's table in another database.
-- ERROR-CONTAINS: OBJECT OWNERSHIP | Permission denied
set user.name=neg_dt2_user1;
CREATE DATABASE IF NOT EXISTS neg_dt2_db;
DROP TABLE IF EXISTS neg_dt2_db.t1;
CREATE TABLE neg_dt2_db.t1 (i INT) USING parquet;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg_dt2_user2;
DROP TABLE neg_dt2_db.t1;
