-- multi_insert_gby2.q: multi-insert whose branches are GLOBAL aggregates
-- (no GROUP BY at all) over an ORDER BY'd shared subquery — one COUNT(*)
-- branch, one exact-percentile branch.
DROP TABLE IF EXISTS g573_e1;
DROP TABLE IF EXISTS g573_e2;
CREATE TABLE g573_e1 (count INT) USING parquet;
CREATE TABLE g573_e2 (med DOUBLE) USING parquet;
FROM (SELECT n_nationkey AS key, CAST(n_nationkey AS DOUBLE) AS value
      FROM nation ORDER BY key) a
INSERT OVERWRITE TABLE g573_e1 SELECT COUNT(*)
INSERT OVERWRITE TABLE g573_e2 SELECT percentile(CAST(value AS BIGINT), 0.5);
SELECT 'e1' AS v, CAST(count AS STRING) AS x FROM g573_e1
UNION ALL
SELECT 'e2', CAST(med AS STRING) FROM g573_e2
