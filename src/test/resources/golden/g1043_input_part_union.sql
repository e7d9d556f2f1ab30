-- reference: ql/src/test/queries/clientpositive/input_part7.q — UNION
-- ALL of two identically-filtered reads of one partitioned table (each
-- row appears TWICE), SORT BY the full column list.
DROP TABLE IF EXISTS g1043_srcpart;
CREATE TABLE g1043_srcpart (key INT, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT INTO g1043_srcpart PARTITION (ds='2008-04-08')
  SELECT n_nationkey, n_name FROM nation;
INSERT INTO g1043_srcpart PARTITION (ds='2008-04-09')
  SELECT r_regionkey, r_name FROM region;
SELECT * FROM (
  SELECT x.* FROM g1043_srcpart x WHERE x.ds = '2008-04-08' AND x.key < 10
  UNION ALL
  SELECT y.* FROM g1043_srcpart y WHERE y.ds = '2008-04-08' AND y.key < 10
) a
SORT BY a.key, a.value, a.ds;
