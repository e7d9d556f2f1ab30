-- reference: ql/src/test/queries/clientpositive/partition_varchar1.q —
-- a VARCHAR(10) partition key beside an INT one: equality, ranges, and
-- misses all prune on both keys.
DROP TABLE IF EXISTS g1112_pv;
CREATE TABLE g1112_pv (key STRING)
  PARTITIONED BY (dt VARCHAR(10), region INT) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1112_pv PARTITION (dt='2000-01-01', region=1)
  SELECT n_name FROM nation TABLESAMPLE (10 ROWS);
INSERT OVERWRITE TABLE g1112_pv PARTITION (dt='2000-01-01', region=2)
  SELECT n_name FROM nation TABLESAMPLE (5 ROWS);
INSERT OVERWRITE TABLE g1112_pv PARTITION (dt='2013-08-08', region=1)
  SELECT n_name FROM nation TABLESAMPLE (20 ROWS);
INSERT OVERWRITE TABLE g1112_pv PARTITION (dt='2013-08-08', region=10)
  SELECT n_name FROM nation TABLESAMPLE (11 ROWS);
SELECT
  (SELECT count(DISTINCT dt) FROM g1112_pv) AS ndt,
  (SELECT count(*) FROM g1112_pv WHERE dt = '2000-01-01') AS eq15,
  (SELECT count(*) FROM g1112_pv WHERE dt = '2000-01-01' AND region = 2) AS eq5,
  (SELECT count(*) FROM g1112_pv WHERE dt = '2013-08-08' AND region = 10) AS eq11,
  (SELECT count(*) FROM g1112_pv WHERE region = 1) AS r30,
  (SELECT count(*) FROM g1112_pv WHERE dt = '2000-01-01' AND region = 3) AS miss,
  (SELECT count(*) FROM g1112_pv WHERE dt > '2000-01-01' AND region = 1) AS gt20,
  (SELECT count(*) FROM g1112_pv WHERE dt < '2000-01-02' AND region = 1) AS lt10
