-- bucket_map_join_spark1.q: bucket map join between two PARTITIONED
-- bucketed tables with equal bucket counts, hashed comparison against
-- the plain join (the reference inserts via mapjoin and compares hashes).
DROP TABLE IF EXISTS g776_p1;
DROP TABLE IF EXISTS g776_p2;
CREATE TABLE g776_p1 (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) INTO 4 BUCKETS;
CREATE TABLE g776_p2 (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) INTO 4 BUCKETS;
INSERT INTO g776_p1 SELECT n_nationkey, n_name, '2008-04-08' FROM nation;
INSERT INTO g776_p2 SELECT n_nationkey, n_name, '2008-04-08' FROM nation WHERE n_nationkey < 15;
SELECT /*+ MAPJOIN(b) */ count(1) AS n, sum(hash(a.key)) AS hk, sum(hash(b.value)) AS hv
FROM g776_p1 a JOIN g776_p2 b
ON a.key = b.key AND a.ds = '2008-04-08' AND b.ds = '2008-04-08'
