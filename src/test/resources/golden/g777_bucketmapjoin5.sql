-- bucketmapjoin5.q: bucket map join where the big side is PARTITIONED
-- (two ds partitions) and bucketed 4-ways, the small side bucketed
-- 2-ways — mismatched bucket counts still join correctly across both
-- partitions.
DROP TABLE IF EXISTS g777_big;
DROP TABLE IF EXISTS g777_small;
CREATE TABLE g777_big (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) INTO 4 BUCKETS;
CREATE TABLE g777_small (key INT, value STRING) USING parquet
  CLUSTERED BY (key) INTO 2 BUCKETS;
INSERT INTO g777_big SELECT n_nationkey, n_name, '2008-04-08' FROM nation;
INSERT INTO g777_big SELECT n_nationkey, n_name, '2008-04-09' FROM nation;
INSERT INTO g777_small SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10;
SELECT /*+ MAPJOIN(b) */ count(1) AS n, sum(hash(a.key)) AS hk, sum(hash(b.value)) AS hv
FROM g777_big a JOIN g777_small b ON a.key = b.key
