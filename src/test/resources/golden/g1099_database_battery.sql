-- reference: ql/src/test/queries/clientpositive/database.q +
-- database_properties.q + describe_database.q — CREATE DATABASE with
-- COMMENT and DBPROPERTIES, USE, a table inside it, DESCRIBE DATABASE
-- surface, and DROP after emptying.
DROP DATABASE IF EXISTS g1099_db CASCADE;
CREATE DATABASE g1099_db COMMENT 'battery database'
  WITH DBPROPERTIES ('mapred.jobtracker.url' = 'http://my.jobtracker.com:53000', 'hive.warehouse.dir' = '/user/hive/warehouse');
USE g1099_db;
CREATE TABLE g1099_inside USING parquet AS
  SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 4;
USE default;
SELECT (SELECT count(*) FROM g1099_db.g1099_inside) AS n_inside,
       current_database() AS back_home
