-- reference: ql/src/test/queries/clientpositive/union26.q — UNION ALL of
-- (a) a partition-filtered self-join and (b) a LATERAL VIEW explode fan-out
-- over the same partition, re-grouped on the outside: the row multiplicity
-- across the two branches is what the count pins.
DROP TABLE IF EXISTS g1025_part;
CREATE TABLE g1025_part (key INT, value STRING) USING parquet PARTITIONED BY (ds STRING, hr STRING);
INSERT INTO g1025_part PARTITION (ds='2008-04-08', hr='11')
  SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 8;
INSERT INTO g1025_part PARTITION (ds='2008-04-08', hr='12')
  SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 6;
SELECT
count(1) as counts,
key,
value
FROM
(
SELECT a.key, a.value
FROM g1025_part a JOIN g1025_part b
ON a.ds='2008-04-08' and a.hr='11' and b.ds='2008-04-08' and b.hr='12'
AND a.key = b.key
UNION ALL
SELECT key, value
FROM g1025_part LATERAL VIEW explode(array(1,2,3)) myTable AS myCol
WHERE ds='2008-04-08' and hr='11'
) a
group by key, value;
