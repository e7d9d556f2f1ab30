-- limit_partition_metadataonly.q + metadata_only_queries_with_filters.q:
-- queries that touch ONLY partition columns — point-filtered partition
-- value, DISTINCT over a partition column, min/max and count(ds) per
-- group — must answer from partition metadata semantics (values repeat
-- per row, pruning applies) even when no data column is read.
DROP TABLE IF EXISTS g540_srcpart;
CREATE TABLE g540_srcpart (key INT, value STRING)
  PARTITIONED BY (ds STRING, hr INT);
INSERT INTO g540_srcpart PARTITION (ds='2008-04-08', hr=11)
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 5;
INSERT INTO g540_srcpart PARTITION (ds='2008-04-08', hr=12)
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 3;
INSERT INTO g540_srcpart PARTITION (ds='2008-04-09', hr=11)
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 4;
SELECT 'point' AS v, ds, CAST(count(*) AS STRING) AS x
FROM g540_srcpart WHERE hr = 11 AND ds = '2008-04-08' GROUP BY ds
UNION ALL
SELECT 'distinct_hr', CAST(hr AS STRING), '' FROM (SELECT DISTINCT hr FROM g540_srcpart) t
UNION ALL
SELECT 'minmax', concat(min(ds), '/', max(ds)), CAST(count(ds) AS STRING) FROM g540_srcpart
UNION ALL
SELECT 'per_ds', ds, CAST(count(hr) AS STRING) FROM g540_srcpart GROUP BY ds
