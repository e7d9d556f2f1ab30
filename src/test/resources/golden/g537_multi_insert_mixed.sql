-- multi_insert_mixed.q: one multi-insert whose branches MIX shapes — two
-- aggregating branches (GROUP BY + ORDER BY inside the branch) and one
-- plain filtered SELECT * — all fed by the single shared scan.
DROP TABLE IF EXISTS g537_src;
DROP TABLE IF EXISTS g537_m1;
DROP TABLE IF EXISTS g537_m2;
DROP TABLE IF EXISTS g537_m3;
CREATE TABLE g537_src USING parquet AS
  SELECT CAST(n_nationkey % 5 AS STRING) AS key, concat('val_', n_regionkey) AS value
  FROM nation;
CREATE TABLE g537_m1 (key STRING, cnt BIGINT) USING parquet;
CREATE TABLE g537_m2 (value STRING, cnt BIGINT) USING parquet;
CREATE TABLE g537_m3 (key STRING, value STRING) USING parquet;
FROM g537_src
INSERT OVERWRITE TABLE g537_m1 SELECT key, count(1) GROUP BY key ORDER BY key
INSERT OVERWRITE TABLE g537_m2 SELECT value, count(1) GROUP BY value ORDER BY value
INSERT OVERWRITE TABLE g537_m3 SELECT * WHERE key < '2';
SELECT 'm1' AS v, key, CAST(cnt AS STRING) AS c FROM g537_m1
UNION ALL
SELECT 'm2', value, CAST(cnt AS STRING) FROM g537_m2
UNION ALL
SELECT 'm3', key, value FROM g537_m3
