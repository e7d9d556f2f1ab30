-- authorization_owner_actions.q: under the SQL-std authorizer the
-- OBJECT OWNER may rename, drop and re-create their own tables and
-- views with no explicit grants (OBJECT OWNERSHIP implies ALL) — the
-- stem's user1 flow: create t1, create view, drop view, rename t1.
set user.name=g969_owner;
DROP TABLE IF EXISTS g969_t1;
DROP TABLE IF EXISTS g969_tnew;
DROP VIEW IF EXISTS g969_v1;
CREATE TABLE g969_t1 (i INT) USING parquet;
INSERT INTO g969_t1 VALUES (1), (2);
CREATE VIEW g969_v1 AS SELECT * FROM g969_t1;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
DROP VIEW g969_v1;
ALTER TABLE g969_t1 RENAME TO g969_tnew;
SELECT count(*) AS n FROM g969_tnew;
DROP TABLE g969_tnew;
set hive.security.authorization.enabled=false;
set hive.security.authorization.manager=;
set user.name=;
SELECT 'owner flow complete' AS ok
