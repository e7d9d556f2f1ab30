-- reference: ql/src/test/queries/clientpositive/input_part0.q (full
-- partition read) + input_part1.q (FROM-first insert selecting partition
-- COLUMNS into data columns, with partition + residual filters) +
-- input_part5.q (x.* star through a partition filter into an
-- unpartitioned table).
DROP TABLE IF EXISTS g1042_srcpart;
DROP TABLE IF EXISTS g1042_dest1;
CREATE TABLE g1042_srcpart (key INT, value STRING)
  USING parquet PARTITIONED BY (ds STRING, hr STRING);
INSERT INTO g1042_srcpart PARTITION (ds='2008-04-08', hr='11')
  SELECT n_nationkey, n_name FROM nation;
INSERT INTO g1042_srcpart PARTITION (ds='2008-04-08', hr='12')
  SELECT n_nationkey, n_name FROM nation;
INSERT INTO g1042_srcpart PARTITION (ds='2008-04-09', hr='11')
  SELECT n_nationkey, n_name FROM nation;
CREATE TABLE g1042_dest1 (key INT, value STRING, hr STRING, ds STRING) USING parquet;
FROM g1042_srcpart
INSERT OVERWRITE TABLE g1042_dest1
  SELECT g1042_srcpart.key, g1042_srcpart.value, g1042_srcpart.hr, g1042_srcpart.ds
  WHERE g1042_srcpart.key < 10 AND g1042_srcpart.ds = '2008-04-08' AND g1042_srcpart.hr = '12';
SELECT g1042_dest1.* FROM g1042_dest1;
