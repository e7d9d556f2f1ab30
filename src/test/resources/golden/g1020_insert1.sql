-- insert1.q (HIVE-3465/HIVE-3676): INSERT targets resolved across
-- DATABASES — same-named tables in different databases stay distinct
-- through case-insensitive names, a FROM-first multi-insert fans into
-- tables of two databases, and USE-scoped inserts reach
-- default-qualified sources.
DROP DATABASE IF EXISTS g1020_x CASCADE;
DROP TABLE IF EXISTS g1020_ins1;
DROP TABLE IF EXISTS g1020_ins2;
CREATE TABLE g1020_ins1 (key INT, value STRING) USING parquet;
CREATE TABLE g1020_ins2 USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, n_name AS value FROM nation;
CREATE DATABASE g1020_x;
CREATE TABLE g1020_x.g1020_ins1 (key INT, value STRING) USING parquet;
FROM g1020_ins2
INSERT INTO TABLE g1020_ins1 SELECT * WHERE key < 10
INSERT OVERWRITE TABLE g1020_x.g1020_ins1 SELECT * WHERE key > 10 AND key < 20;
INSERT INTO TABLE g1020_x.G1020_INS1
  SELECT a.key, a.value FROM g1020_ins2 a WHERE a.key = 20;
SELECT 'default_db' AS probe, key, value FROM g1020_ins1
UNION ALL
SELECT 'x_db' AS probe, key, value FROM g1020_x.g1020_ins1
