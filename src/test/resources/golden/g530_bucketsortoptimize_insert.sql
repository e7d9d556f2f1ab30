-- bucketsortoptimize_insert_2.q: INSERT OVERWRITE into a bucketed+sorted
-- partitioned table from the join of two co-bucketed sorted tables, one
-- source partition each — then read the result back per-bucket with
-- TABLESAMPLE(BUCKET x OUT OF 2) to pin that the bucket layout landed.
DROP TABLE IF EXISTS g530_t1;
DROP TABLE IF EXISTS g530_t2;
DROP TABLE IF EXISTS g530_t3;
CREATE TABLE g530_t1 (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
CREATE TABLE g530_t2 (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
CREATE TABLE g530_t3 (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
INSERT OVERWRITE TABLE g530_t1 PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 10;
INSERT OVERWRITE TABLE g530_t2 PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 20;
INSERT OVERWRITE TABLE g530_t1 PARTITION (ds='2')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 10;
INSERT OVERWRITE TABLE g530_t3 PARTITION (ds='1')
  SELECT a.key, concat(a.value, b.value)
  FROM g530_t1 a JOIN g530_t2 b ON a.key = b.key
  WHERE a.ds = '1' AND b.ds = '1';
SELECT 'b1' AS v, key, value, ds FROM g530_t3 TABLESAMPLE (BUCKET 1 OUT OF 2) WHERE ds = '1'
UNION ALL
SELECT 'b2', key, value, ds FROM g530_t3 TABLESAMPLE (BUCKET 2 OUT OF 2) WHERE ds = '1'
