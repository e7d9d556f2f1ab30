-- innerjoin.q: the INNER keyword on an explicit join feeding a FROM-first
-- insert, plus `inner` used as a TABLE name and a COLUMN name unquoted —
-- Hive's non-reserved identifier rules must hold.
DROP TABLE IF EXISTS g552_dest;
DROP TABLE IF EXISTS inner;
DROP TABLE IF EXISTS g552_i;
CREATE TABLE g552_dest (key INT, value STRING) USING parquet;
FROM nation src1 INNER JOIN nation src2 ON (src1.n_nationkey = src2.n_nationkey)
INSERT OVERWRITE TABLE g552_dest
  SELECT src1.n_nationkey, src2.n_name WHERE src1.n_nationkey < 6;
CREATE TABLE inner (i INT) USING parquet;
INSERT INTO inner VALUES (42);
CREATE TABLE g552_i (inner INT) USING parquet;
INSERT INTO g552_i VALUES (7);
SELECT 'dest' AS v, CAST(key AS STRING) AS a, value AS b FROM g552_dest
UNION ALL
SELECT 'tbl_inner', CAST(i AS STRING), '' FROM inner
UNION ALL
SELECT 'col_inner', CAST(inner AS STRING), '' FROM g552_i
