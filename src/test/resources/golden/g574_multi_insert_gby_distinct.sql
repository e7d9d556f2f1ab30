-- multi_insert_gby3.q: branches with DIFFERENT groupings over the shared
-- scan — COUNT(DISTINCT value) by key next to sum by (key, value) — run
-- in BOTH branch orders (order-1 results snapshotted into g574_s*);
-- results must be order-independent.
DROP TABLE IF EXISTS g574_e1;
DROP TABLE IF EXISTS g574_e2;
DROP TABLE IF EXISTS g574_s1;
DROP TABLE IF EXISTS g574_s2;
CREATE TABLE g574_e1 (key STRING, keyD DOUBLE) USING parquet;
CREATE TABLE g574_e2 (key STRING, keyD DOUBLE, value STRING) USING parquet;
FROM (SELECT CAST(n_nationkey % 4 AS STRING) AS key,
             CAST(n_nationkey % 4 AS DOUBLE) AS keyD,
             concat('v', n_regionkey % 2) AS value
      FROM nation ORDER BY key) a
INSERT OVERWRITE TABLE g574_e1
    SELECT key, COUNT(DISTINCT value) GROUP BY key
INSERT OVERWRITE TABLE g574_e2
    SELECT key, sum(keyD), value GROUP BY key, value;
CREATE TABLE g574_s1 USING parquet AS SELECT * FROM g574_e1;
CREATE TABLE g574_s2 USING parquet AS SELECT * FROM g574_e2;
FROM (SELECT CAST(n_nationkey % 4 AS STRING) AS key,
             CAST(n_nationkey % 4 AS DOUBLE) AS keyD,
             concat('v', n_regionkey % 2) AS value
      FROM nation ORDER BY key) a
INSERT OVERWRITE TABLE g574_e2
    SELECT key, sum(keyD), value GROUP BY key, value
INSERT OVERWRITE TABLE g574_e1
    SELECT key, COUNT(DISTINCT value) GROUP BY key;
SELECT 'o1_e1' AS v, key, CAST(keyD AS STRING) AS a, '' AS b FROM g574_s1
UNION ALL
SELECT 'o1_e2', key, CAST(keyD AS STRING), value FROM g574_s2
UNION ALL
SELECT 'o2_e1', key, CAST(keyD AS STRING), '' FROM g574_e1
UNION ALL
SELECT 'o2_e2', key, CAST(keyD AS STRING), value FROM g574_e2
