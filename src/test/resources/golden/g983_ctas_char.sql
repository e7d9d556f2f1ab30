-- ctas_char.q: CTAS over a char(10) column and a view over the CTAS —
-- the derived objects read the same (stripped) values as the source
-- (Hive's CTAS degrades char to string; equality of values is the pin).
DROP TABLE IF EXISTS g983_c1;
DROP TABLE IF EXISTS g983_c2;
DROP VIEW IF EXISTS g983_c3;
CREATE TABLE g983_c1 (key CHAR(10), value STRING) USING parquet;
INSERT OVERWRITE TABLE g983_c1
  SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value FROM nation
  SORT BY key, value LIMIT 5;
CREATE TABLE g983_c2 USING parquet AS SELECT key, value FROM g983_c1;
CREATE VIEW g983_c3 AS SELECT key, value FROM g983_c2;
SELECT 't1' AS probe, key, length(key) AS klen, value FROM g983_c1
UNION ALL
SELECT 't2' AS probe, key, length(key) AS klen, value FROM g983_c2
UNION ALL
SELECT 'v3' AS probe, key, length(key) AS klen, value FROM g983_c3
