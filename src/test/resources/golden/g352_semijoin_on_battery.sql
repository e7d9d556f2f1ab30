-- semijoin.q shapes: semi join with reversed ON sides, right-side filter
-- inside ON, derived-table right side, and a semi join against an empty table
DROP TABLE IF EXISTS g352_t1;
DROP TABLE IF EXISTS g352_t2;
DROP TABLE IF EXISTS g352_t4;
CREATE TABLE g352_t1 AS SELECT cast(n_nationkey AS int) AS key, n_name AS value FROM nation WHERE n_nationkey <= 10;
CREATE TABLE g352_t2 AS SELECT cast(2 * n_nationkey AS int) AS key, n_name AS value FROM nation WHERE n_nationkey <= 10;
CREATE TABLE g352_t4 (key INT, value STRING) USING parquet;
SELECT a.key, a.value, 'rev' AS tag FROM g352_t2 a LEFT SEMI JOIN g352_t1 b ON b.key = a.key
UNION ALL
SELECT a.key, a.value, 'onfilter' FROM g352_t1 a LEFT SEMI JOIN g352_t2 b ON a.key = b.key AND b.value < 'NATION_3'
UNION ALL
SELECT a.key, a.value, 'empty' FROM g352_t1 a LEFT SEMI JOIN g352_t4 b ON b.key = a.key
UNION ALL
SELECT a.key, a.value, 'derived' FROM g352_t1 a LEFT SEMI JOIN (SELECT key, value FROM g352_t2 WHERE key > 5) b ON a.key = b.key AND b.value <= 'NATION_8'
