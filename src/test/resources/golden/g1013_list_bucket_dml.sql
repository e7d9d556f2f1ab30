-- list_bucket_dml_1.q family: DML into a SKEWED BY ... STORED AS
-- DIRECTORIES table through a dynamic partition insert — list
-- bucketing is a storage-layout optimization, so counts and the
-- skewed-value rows must equal the plain source exactly.
DROP TABLE IF EXISTS g1013_lb;
DROP TABLE IF EXISTS g1013_srcpart;
CREATE TABLE g1013_srcpart (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING, hr STRING);
INSERT INTO g1013_srcpart PARTITION (ds='2008-04-08', hr='11')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
INSERT INTO g1013_srcpart PARTITION (ds='2008-04-08', hr='12')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation
  WHERE n_nationkey < 10;
CREATE TABLE g1013_lb (key STRING, value STRING)
  PARTITIONED BY (ds STRING, hr STRING)
  SKEWED BY (key) ON ("4") STORED AS DIRECTORIES;
SET hive.exec.dynamic.partition.mode=nonstrict;
INSERT OVERWRITE TABLE g1013_lb PARTITION (ds='2008-04-08', hr)
  SELECT key, value, hr FROM g1013_srcpart WHERE ds='2008-04-08';
SELECT (SELECT count(1) FROM g1013_srcpart WHERE ds='2008-04-08') AS src_n,
       (SELECT count(1) FROM g1013_lb WHERE ds='2008-04-08') AS lb_n,
       (SELECT value FROM g1013_lb
          WHERE ds='2008-04-08' AND hr='11' AND key = '4') AS skewed_val
