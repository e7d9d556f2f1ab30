-- smb_mapjoin_6.q shape: three bucketed+sorted tables in one chain,
-- inner then left outer, hint on the middle table.
DROP TABLE IF EXISTS g473_a;
DROP TABLE IF EXISTS g473_b;
DROP TABLE IF EXISTS g473_c;
CREATE TABLE g473_a (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE g473_b (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE g473_c (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
INSERT INTO g473_a VALUES (1,'a1'), (3,'a3'), (4,'a4'), (5,'a5'), (10,'a10');
INSERT INTO g473_b VALUES (1,'b1'), (4,'b4'), (7,'b7'), (10,'b10');
INSERT INTO g473_c VALUES (4,'c4'), (10,'c10'), (17,'c17');
SELECT /*+ MAPJOIN(b) */ a.key AS ak, b.value AS bv, c.value AS cv
FROM g473_a a
JOIN g473_b b ON a.key = b.key
LEFT OUTER JOIN g473_c c ON a.key = c.key
