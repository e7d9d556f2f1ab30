-- reference: ql/src/test/queries/clientpositive/input22.q (subquery
-- projecting tbl.* PLUS a renamed copy of one column, outer selects the
-- alias with ORDER BY LIMIT) + input26.q (UNION ALL of two
-- ordered-and-limited partition-filtered subqueries).
DROP TABLE IF EXISTS g1034_p;
CREATE TABLE g1034_p (key INT, value STRING) USING parquet PARTITIONED BY (ds STRING, hr STRING);
INSERT INTO g1034_p PARTITION (ds='2008-04-08', hr='11')
  SELECT n_nationkey, n_name FROM nation;
INSERT INTO g1034_p PARTITION (ds='2008-04-08', hr='14')
  SELECT r_regionkey, r_name FROM region;
SELECT a.key2 FROM (SELECT nation.*, nation.n_nationkey AS key2 FROM nation) a ORDER BY key2 LIMIT 10;
SELECT * FROM (
  SELECT * FROM (SELECT * FROM g1034_p a WHERE a.ds = '2008-04-08' AND a.hr = '11' ORDER BY a.key LIMIT 5) pa
  UNION ALL
  SELECT * FROM (SELECT * FROM g1034_p b WHERE b.ds = '2008-04-08' AND b.hr = '14' ORDER BY b.key LIMIT 5) pb
) subq;
