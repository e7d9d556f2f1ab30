-- reference: ql/src/test/queries/clientpositive/bucketcontext_3.q +
-- bucketcontext_4.q + bucketcontext_5.q + bucketcontext_6.q +
-- bucketcontext_7.q + bucketcontext_8.q — bucket mapjoin with
-- mismatched bucket counts each way (2-vs-4, 4-vs-2), partitioned and
-- unpartitioned smalls, hinted and bare; every shape must agree on
-- the join count.
set hive.optimize.bucketmapjoin=true;
DROP TABLE IF EXISTS g1148_small2;
DROP TABLE IF EXISTS g1148_big4;
CREATE TABLE g1148_small2 (key STRING, value STRING)
  PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE g1148_big4 (key STRING, value STRING)
  PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 4 BUCKETS STORED AS PARQUET;
INSERT OVERWRITE TABLE g1148_small2 PARTITION (ds='2008-04-08')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey % 2 = 0;
INSERT OVERWRITE TABLE g1148_small2 PARTITION (ds='2008-04-09')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey % 2 = 1;
INSERT OVERWRITE TABLE g1148_big4 PARTITION (ds='2008-04-08')
  SELECT CAST(l_orderkey % 25 AS STRING), l_returnflag
  FROM lineitem WHERE l_orderkey < 400;
SELECT
  (SELECT /*+ MAPJOIN(a) */ count(*) FROM g1148_small2 a
   JOIN g1148_big4 b ON a.key = b.key) AS small_hinted,
  (SELECT /*+ MAPJOIN(b) */ count(*) FROM g1148_big4 b
   JOIN g1148_small2 a ON a.key = b.key) AS big_hinted,
  (SELECT count(*) FROM g1148_small2 a
   JOIN g1148_big4 b ON a.key = b.key) AS bare
