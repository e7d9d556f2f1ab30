-- smb_mapjoin_1.q..3.q: bucketed+sorted tables, mapjoin hint on either
-- side, all four join types. On Spark the bucketed layout elides the
-- shuffle (SMB join); the hint maps to broadcast — either plan must give
-- identical rows.
set hive.optimize.bucketmapjoin = true;
set hive.optimize.bucketmapjoin.sortedmerge = true;
DROP TABLE IF EXISTS g434_b1;
DROP TABLE IF EXISTS g434_b2;
CREATE TABLE g434_b1 (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 1 BUCKETS STORED AS PARQUET;
CREATE TABLE g434_b2 (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 1 BUCKETS STORED AS PARQUET;
INSERT INTO g434_b1 VALUES (1,'v1'), (3,'v3'), (4,'v4'), (5,'v5'), (10,'v10');
INSERT INTO g434_b2 VALUES (1,'w1'), (4,'w4'), (7,'w7'), (10,'w10'), (20,'w20');
SELECT /*+ MAPJOIN(a) */ 'inner_a' AS tag, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g434_b1 a JOIN g434_b2 b ON a.key = b.key
UNION ALL
SELECT /*+ MAPJOIN(a) */ 'loj_a', a.key, a.value, b.key, b.value
FROM g434_b1 a LEFT OUTER JOIN g434_b2 b ON a.key = b.key
UNION ALL
SELECT /*+ MAPJOIN(a) */ 'roj_a', a.key, a.value, b.key, b.value
FROM g434_b1 a RIGHT OUTER JOIN g434_b2 b ON a.key = b.key
UNION ALL
SELECT /*+ MAPJOIN(a) */ 'foj_a', a.key, a.value, b.key, b.value
FROM g434_b1 a FULL OUTER JOIN g434_b2 b ON a.key = b.key
UNION ALL
SELECT /*+ MAPJOIN(b) */ 'inner_b', a.key, a.value, b.key, b.value
FROM g434_b1 a JOIN g434_b2 b ON a.key = b.key
UNION ALL
SELECT /*+ MAPJOIN(b) */ 'foj_b', a.key, a.value, b.key, b.value
FROM g434_b1 a FULL OUTER JOIN g434_b2 b ON a.key = b.key
