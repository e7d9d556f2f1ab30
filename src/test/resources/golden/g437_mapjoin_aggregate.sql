-- join25.q/join26.q/join27.q: mapjoin hint feeding an aggregation, a
-- mapjoin over a group-by subquery, and a mapjoin on the value column
-- with NULLs in play.
DROP TABLE IF EXISTS g437_t;
CREATE TABLE g437_t (key INT, value STRING);
INSERT INTO g437_t VALUES (1,'a'), (2,'b'), (2,'b'), (3,NULL), (5,'e'), (5,'e'), (5,'x');
SELECT 'agg' AS tag, cast(x.key AS STRING) AS k, cast(count(1) AS STRING) AS v
FROM (SELECT /*+ MAPJOIN(b) */ a.key, b.value FROM g437_t a JOIN g437_t b ON a.key = b.key) x
GROUP BY x.key
UNION ALL
SELECT 'subq', cast(a.key AS STRING), cast(g.cnt AS STRING)
FROM g437_t a JOIN (SELECT key, count(1) AS cnt FROM g437_t GROUP BY key) g ON a.key = g.key
WHERE a.key > 2
UNION ALL
SELECT 'valjoin', cast(a.key AS STRING), b.value
FROM g437_t a JOIN g437_t b ON a.value = b.value
WHERE a.key >= 5
