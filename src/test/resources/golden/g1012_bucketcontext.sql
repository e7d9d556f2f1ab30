-- bucketcontext_1.q family: MAPJOIN between a small 2-bucket
-- partitioned table and a big 4-bucket two-partition table — the
-- differing bucket counts and partition counts must not change the
-- join cardinality (each big partition joins the whole small side).
DROP TABLE IF EXISTS g1012_small;
DROP TABLE IF EXISTS g1012_big;
CREATE TABLE g1012_small (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
CREATE TABLE g1012_big (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 4 BUCKETS;
INSERT OVERWRITE TABLE g1012_small PARTITION (ds='2008-04-08')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation
  WHERE n_nationkey < 10;
INSERT OVERWRITE TABLE g1012_big PARTITION (ds='2008-04-08')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
INSERT OVERWRITE TABLE g1012_big PARTITION (ds='2008-04-09')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
SELECT /*+ MAPJOIN(a) */ count(*) AS c
FROM g1012_small a JOIN g1012_big b ON a.key = b.key
