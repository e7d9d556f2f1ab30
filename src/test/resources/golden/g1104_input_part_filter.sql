-- reference: ql/src/test/queries/clientpositive/input_part9.q (+
-- input_part1/input_part5 shapes) — x.* over a partitioned table with
-- a partition-key equality plus a data-column predicate; only the
-- named partition is read.
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1104_srcpart;
CREATE TABLE g1104_srcpart (key INT, value STRING)
  PARTITIONED BY (ds STRING, hr STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1104_srcpart PARTITION (ds, hr)
  SELECT CAST(n_nationkey AS INT), n_name,
         concat('2008-04-0', 8 + n_nationkey % 2),
         CAST(11 + n_regionkey % 2 AS STRING)
  FROM nation;
SELECT x.* FROM g1104_srcpart x
WHERE key IS NOT NULL AND ds = '2008-04-08'
