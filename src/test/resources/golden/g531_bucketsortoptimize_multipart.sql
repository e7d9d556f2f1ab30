-- bucketsortoptimize_insert_2.q (multi-partition big side): when MORE
-- than one partition of the big table feeds the insert, the reference
-- falls back from the map-only SMB insert to a shuffle plan — either way
-- the INSERTED CONTENT must be identical. Pin content + per-bucket reads.
DROP TABLE IF EXISTS g531_t1;
DROP TABLE IF EXISTS g531_t2;
DROP TABLE IF EXISTS g531_t3;
CREATE TABLE g531_t1 (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
CREATE TABLE g531_t2 (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
CREATE TABLE g531_t3 (key INT, value STRING, ds STRING) USING parquet
  PARTITIONED BY (ds) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
INSERT OVERWRITE TABLE g531_t1 PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 6;
INSERT OVERWRITE TABLE g531_t1 PARTITION (ds='2')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 6;
INSERT OVERWRITE TABLE g531_t2 PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 12;
INSERT OVERWRITE TABLE g531_t3 PARTITION (ds='1')
  SELECT a.key, concat(a.value, b.value)
  FROM g531_t1 a JOIN g531_t2 b ON a.key = b.key
  WHERE a.ds IS NOT NULL AND b.ds = '1';
SELECT 'all' AS v, key, value, ds FROM g531_t3 WHERE ds = '1'
UNION ALL
SELECT 'b1', key, value, ds FROM g531_t3 TABLESAMPLE (BUCKET 1 OUT OF 2) WHERE ds = '1'
