-- authorization_delete_own_table.q: under the SQL-std authorizer the
-- table OWNER may DELETE from their own table with no explicit grant
-- (ownership implies ALL; the CoW delete is the engine's ACID path).
set user.name=g970_owner;
DROP TABLE IF EXISTS g970_t;
CREATE TABLE g970_t (i INT) USING parquet;
INSERT INTO g970_t VALUES (1), (2), (-3);
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
DELETE FROM g970_t WHERE i > 0;
set hive.security.authorization.enabled=false;
set hive.security.authorization.manager=;
set user.name=;
SELECT i FROM g970_t
