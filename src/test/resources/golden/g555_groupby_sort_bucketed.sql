-- groupby_sort_1_23.q: GROUP BY whose keys are exactly a bucketed+sorted
-- table's sort keys (the map-side shortcut Hive's
-- hive.map.groupby.sorted exploits) — and a second aggregation on a
-- PREFIX of the sort keys; results must match the plain hash-agg answer.
DROP TABLE IF EXISTS g555_t1;
DROP TABLE IF EXISTS g555_out1;
DROP TABLE IF EXISTS g555_out2;
CREATE TABLE g555_t1 (key STRING, val STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key, val) INTO 2 BUCKETS;
INSERT OVERWRITE TABLE g555_t1
  SELECT CAST(n_nationkey % 5 AS STRING), concat('v', n_regionkey) FROM nation;
CREATE TABLE g555_out1 (key INT, cnt INT) USING parquet;
CREATE TABLE g555_out2 (key1 INT, key2 STRING, cnt INT) USING parquet;
INSERT OVERWRITE TABLE g555_out1
  SELECT key, count(1) FROM g555_t1 GROUP BY key;
INSERT OVERWRITE TABLE g555_out2
  SELECT key, val, count(1) FROM g555_t1 GROUP BY key, val;
SELECT 'k' AS v, CAST(key AS STRING) AS a, '' AS b, cnt FROM g555_out1
UNION ALL
SELECT 'kv', CAST(key1 AS STRING), key2, cnt FROM g555_out2
