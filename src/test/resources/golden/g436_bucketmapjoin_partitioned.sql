-- bucketmapjoin1.q shape: a bucketed fact per partition joined to a
-- bucketed dim with the mapjoin hint; the partition filter must prune
-- before the join.
set hive.optimize.bucketmapjoin = true;
DROP TABLE IF EXISTS g436_f;
DROP TABLE IF EXISTS g436_d;
CREATE TABLE g436_f (key INT, value STRING) PARTITIONED BY (ds STRING) CLUSTERED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE g436_d (key INT, value STRING) CLUSTERED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
INSERT INTO g436_f PARTITION (ds='2008-04-08') VALUES (1,'f1'), (2,'f2'), (4,'f4'), (8,'f8');
INSERT INTO g436_f PARTITION (ds='2008-04-09') VALUES (1,'x1'), (3,'x3'), (4,'x4');
INSERT INTO g436_d VALUES (1,'d1'), (4,'d4'), (8,'d8'), (9,'d9');
SELECT /*+ MAPJOIN(b) */ a.key AS k, a.value AS fv, b.value AS dv
FROM g436_f a JOIN g436_d b ON a.key = b.key
WHERE a.ds = '2008-04-08'
