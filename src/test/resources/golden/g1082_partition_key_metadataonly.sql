-- reference: ql/src/test/queries/clientpositive/
-- limit_partition_metadataonly.q — selecting only partition keys
-- (with and without a partition filter) answers from partition
-- metadata; the values must match the data regardless.
SET hive.exec.dynamic.partition=true;
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1082_srcpart;
CREATE TABLE g1082_srcpart (key INT)
  PARTITIONED BY (ds STRING, hr STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1082_srcpart PARTITION (ds, hr)
  SELECT CAST(n_nationkey AS INT),
         concat('2008-04-0', 8 + (n_nationkey % 2)),
         CAST(11 + (n_regionkey % 2) AS STRING)
  FROM nation;
SELECT (SELECT count(DISTINCT ds) FROM g1082_srcpart
        WHERE hr = '11' AND ds = '2008-04-08') AS one_ds,
       (SELECT count(DISTINCT hr) FROM g1082_srcpart) AS distinct_hr,
       (SELECT min(ds) FROM g1082_srcpart) AS min_ds,
       (SELECT max(hr) FROM g1082_srcpart) AS max_hr
