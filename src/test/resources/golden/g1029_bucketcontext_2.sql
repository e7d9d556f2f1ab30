-- reference: ql/src/test/queries/clientpositive/bucketcontext_2.q —
-- "small 1 part, 4 bucket & big 2 part, 2 bucket": a MAPJOIN between
-- partitioned tables whose bucket counts DIFFER (4 vs 2, a 2:1
-- divisible ratio, the shape Hive's bucket-context join optimizes).
DROP TABLE IF EXISTS g1029_small;
DROP TABLE IF EXISTS g1029_big;
CREATE TABLE g1029_small (key STRING, value STRING) USING parquet
  PARTITIONED BY (ds STRING) CLUSTERED BY (key) SORTED BY (key) INTO 4 BUCKETS;
CREATE TABLE g1029_big (key STRING, value STRING) USING parquet
  PARTITIONED BY (ds STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
INSERT INTO g1029_small PARTITION (ds='2008-04-08')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation;
INSERT INTO g1029_big PARTITION (ds='2008-04-08')
  SELECT cast(s_suppkey AS STRING), s_name FROM supplier;
INSERT INTO g1029_big PARTITION (ds='2008-04-09')
  SELECT cast(s_suppkey AS STRING), s_name FROM supplier;
SELECT /*+ MAPJOIN(a) */ count(*) AS cnt FROM g1029_small a JOIN g1029_big b ON a.key = b.key;
