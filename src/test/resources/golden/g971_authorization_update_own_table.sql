-- authorization_update_own_table.q: the owner may UPDATE their own
-- table under the SQL-std authorizer — no explicit Update grant needed.
set user.name=g971_owner;
DROP TABLE IF EXISTS g971_t;
CREATE TABLE g971_t (i INT, s STRING) USING parquet;
INSERT INTO g971_t VALUES (1, 'a'), (2, 'b');
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
UPDATE g971_t SET s = 'updated' WHERE i = 2;
set hive.security.authorization.enabled=false;
set hive.security.authorization.manager=;
set user.name=;
SELECT i, s FROM g971_t ORDER BY i
