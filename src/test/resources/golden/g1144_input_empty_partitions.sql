-- reference: ql/src/test/queries/clientpositive/input23.q + input25.q —
-- a self-join where one side names a partition that does NOT exist
-- (zero rows under a LIMIT), and a UNION ALL of limited selects over
-- metadata-only (fileless) partitions.
DROP TABLE IF EXISTS g1144_srcpart;
DROP TABLE IF EXISTS g1144_tst;
CREATE TABLE g1144_srcpart (key INT)
  PARTITIONED BY (ds STRING, hr STRING) STORED AS PARQUET;
INSERT INTO g1144_srcpart PARTITION (ds='2008-04-08', hr='11')
  SELECT CAST(n_nationkey AS INT) FROM nation;
CREATE TABLE g1144_tst (a INT, b INT)
  PARTITIONED BY (d STRING) STORED AS PARQUET;
ALTER TABLE g1144_tst ADD PARTITION (d='2009-01-01');
ALTER TABLE g1144_tst ADD PARTITION (d='2009-02-02');
SELECT
  (SELECT count(*) FROM
    (SELECT a.key FROM g1144_srcpart a JOIN g1144_srcpart b
     ON a.ds = '2008-04-08' AND a.hr = '11'
        AND b.ds = '2008-04-08' AND b.hr = '14' LIMIT 5) j) AS joined_missing,
  (SELECT count(*) FROM (
     SELECT * FROM (SELECT * FROM g1144_tst x WHERE x.d = '2009-01-01' LIMIT 10) a
     UNION ALL
     SELECT * FROM (SELECT * FROM g1144_tst x WHERE x.d = '2009-02-02' LIMIT 10) b
  ) u) AS union_empty
