-- orc_createas1.q: CTAS into STORED AS ORC — from a plain source and
-- from a partitioned source (partition column becomes a DATA column in
-- the CTAS target) — values survive and order/limit behaves.
DROP TABLE IF EXISTS g995_a;
DROP TABLE IF EXISTS g995_b;
DROP TABLE IF EXISTS g995_c;
CREATE TABLE g995_a (key INT, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT OVERWRITE TABLE g995_a PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
INSERT OVERWRITE TABLE g995_a PARTITION (ds='2')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
CREATE TABLE g995_b STORED AS ORC AS
  SELECT CAST(n_nationkey AS INT) AS key, n_name AS value FROM nation;
CREATE TABLE g995_c STORED AS ORC AS
  SELECT key, value, ds FROM g995_a;
SELECT 'b' AS probe, key, value, NULL AS ds
  FROM (SELECT * FROM g995_b ORDER BY key LIMIT 5) x
UNION ALL
SELECT 'c' AS probe, key, value, ds
  FROM (SELECT * FROM g995_c ORDER BY ds, key LIMIT 5) y
