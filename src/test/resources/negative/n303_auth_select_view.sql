-- reference: ql/src/test/queries/clientnegative/authorization_select_view.q
-- — selecting from a VIEW without select privileges is refused: the view
-- itself is the gated object (privileges on a view are independent of
-- the underlying table's).
-- ERROR-CONTAINS: No privilege 'Select' | Permission denied
CREATE DATABASE IF NOT EXISTS neg_asv_db;
DROP VIEW IF EXISTS neg_asv_db.v1;
DROP TABLE IF EXISTS neg_asv_db.t1;
CREATE TABLE neg_asv_db.t1 (i INT) USING parquet;
CREATE VIEW neg_asv_db.v1 AS SELECT * FROM neg_asv_db.t1;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg_asv_user1;
SELECT * FROM neg_asv_db.v1;
