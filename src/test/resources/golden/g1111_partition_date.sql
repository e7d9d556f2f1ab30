-- reference: ql/src/test/queries/clientpositive/partition_date.q — a
-- DATE-typed partition key: date-literal and string comparands,
-- equality, ranges, and a never-matching date all prune correctly.
DROP TABLE IF EXISTS g1111_pd;
CREATE TABLE g1111_pd (key STRING)
  PARTITIONED BY (dt DATE, region STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1111_pd PARTITION (dt='2000-01-01', region='1')
  SELECT n_name FROM nation TABLESAMPLE (10 ROWS);
INSERT OVERWRITE TABLE g1111_pd PARTITION (dt='2000-01-01', region='2')
  SELECT n_name FROM nation TABLESAMPLE (5 ROWS);
INSERT OVERWRITE TABLE g1111_pd PARTITION (dt='2013-08-08', region='1')
  SELECT n_name FROM nation TABLESAMPLE (20 ROWS);
INSERT OVERWRITE TABLE g1111_pd PARTITION (dt='2013-08-08', region='10')
  SELECT n_name FROM nation TABLESAMPLE (11 ROWS);
SELECT
  (SELECT count(DISTINCT dt) FROM g1111_pd) AS ndt,
  (SELECT count(*) FROM g1111_pd WHERE dt = DATE '2000-01-01') AS eq_lit,
  (SELECT count(*) FROM g1111_pd WHERE dt = '2000-01-01') AS eq_str,
  (SELECT count(*) FROM g1111_pd WHERE dt = DATE '2000-01-01' AND region = '2') AS eq_r2,
  (SELECT count(*) FROM g1111_pd WHERE region = '1') AS r1,
  (SELECT count(*) FROM g1111_pd WHERE dt = DATE '1999-01-01') AS none,
  (SELECT count(*) FROM g1111_pd WHERE dt > DATE '2000-01-01' AND region = '1') AS gt,
  (SELECT count(*) FROM g1111_pd WHERE dt < DATE '2000-01-02' AND region = '1') AS lt
