-- view_inputs.q / view.q: a view over a view, joined against the inner
-- view — lineage resolves through both layers; plus a db-qualified
-- view over another database's table.
DROP VIEW IF EXISTS g862_v2;
DROP VIEW IF EXISTS g862_v1;
CREATE DATABASE IF NOT EXISTS g862_db;
DROP TABLE IF EXISTS g862_db.t1;
CREATE TABLE g862_db.t1 (key INT, value STRING) USING parquet;
INSERT INTO g862_db.t1 SELECT n_nationkey, n_name FROM nation;
CREATE VIEW g862_v1 AS SELECT * FROM g862_db.t1;
CREATE VIEW g862_v2 AS SELECT * FROM g862_v1;
SELECT count(*) AS n FROM g862_v1 a JOIN g862_v2 b ON a.key = b.key
