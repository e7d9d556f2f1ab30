-- reference: ql/src/test/queries/clientpositive/show_columns.q — SHOW
-- COLUMNS from/in a table (partition columns included), db-qualified
-- name, and the trailing FROM db form.
DROP TABLE IF EXISTS g1048_shcol;
CREATE DATABASE IF NOT EXISTS g1048_db;
DROP TABLE IF EXISTS g1048_db.foo;
CREATE TABLE g1048_shcol (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
CREATE TABLE g1048_db.foo (a INT) USING parquet;
SHOW COLUMNS FROM g1048_db.foo;
SHOW COLUMNS FROM foo IN g1048_db;
SHOW COLUMNS IN g1048_shcol;
