-- reference: ql/src/test/queries/clientpositive/merge_dynamic_partition2.q
-- + merge_dynamic_partition3.q — a dynamic-partition INSERT under the
-- small-file merge confs: many small inputs land per partition, the
-- merge coalesces them, and the per-partition counts stay exact.
DROP TABLE IF EXISTS g1053_src;
DROP TABLE IF EXISTS g1053_merged;
CREATE TABLE g1053_src (key INT, value STRING, ds STRING, hr STRING) USING parquet;
INSERT INTO g1053_src SELECT n_nationkey, n_name, '2008-04-08', cast(n_nationkey % 3 AS STRING) FROM nation;
CREATE TABLE g1053_merged (key INT, value STRING) USING parquet PARTITIONED BY (ds STRING, hr STRING);
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
set hive.merge.mapfiles=true;
set hive.merge.mapredfiles=true;
INSERT OVERWRITE TABLE g1053_merged PARTITION (ds, hr)
  SELECT key, value, ds, hr FROM g1053_src DISTRIBUTE BY ds, hr;
set hive.merge.mapfiles=false;
set hive.merge.mapredfiles=false;
SELECT ds, hr, count(1) AS n FROM g1053_merged GROUP BY ds, hr;
