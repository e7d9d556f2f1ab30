-- union_ppr.q shape: UNION ALL of two scans of the same partitioned
-- table with a partition filter applied outside the union.
DROP TABLE IF EXISTS g482_p;
CREATE TABLE g482_p (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g482_p PARTITION (ds='2008-04-08') VALUES (1,'a'), (2,'b'), (3,'c');
INSERT INTO g482_p PARTITION (ds='2008-04-09') VALUES (4,'d'), (5,'e');
SELECT u.key AS k, u.value AS v, u.ds AS ds
FROM (
  SELECT key, value, ds FROM g482_p
  UNION ALL
  SELECT key, value, ds FROM g482_p
) u
WHERE u.ds = '2008-04-08' AND u.key < 3
