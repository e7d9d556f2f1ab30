-- reference: ql/src/test/queries/clientpositive/merge3.q (+ merge4.q
-- shape) — CTAS and dynamic-partition insert under the small-file
-- merge confs: content survives the merge, partition counts exact.
set hive.merge.mapfiles=false;
set hive.merge.mapredfiles=false;
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1141_src;
DROP TABLE IF EXISTS g1141_part;
DROP TABLE IF EXISTS g1141_src2;
CREATE TABLE g1141_src AS
  SELECT CAST(l_orderkey AS STRING) AS key, l_returnflag AS value,
         concat('d', l_orderkey % 3) AS ds
  FROM lineitem WHERE l_orderkey < 300;
CREATE TABLE g1141_part (key STRING, value STRING)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1141_part PARTITION (ds)
  SELECT key, value, ds FROM g1141_src DISTRIBUTE BY ds;
set hive.merge.mapfiles=true;
set hive.merge.mapredfiles=true;
CREATE TABLE g1141_src2 AS SELECT key, value FROM g1141_src;
set hive.merge.mapfiles=false;
set hive.merge.mapredfiles=false;
SELECT (SELECT count(*) FROM g1141_src2) AS n2,
       (SELECT sum(hash(key, value)) FROM g1141_src) =
         (SELECT sum(hash(key, value)) FROM g1141_src2) AS same,
       (SELECT count(DISTINCT ds) FROM g1141_part) AS nparts
