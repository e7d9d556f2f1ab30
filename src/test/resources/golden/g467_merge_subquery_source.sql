-- MERGE with a parenthesized subquery source containing its own JOIN ...
-- ON (the slicer must not confuse the join's ON with MERGE's ON), update
-- branch only.
DROP TABLE IF EXISTS g467_t;
CREATE TABLE g467_t (k INT, name STRING, region STRING);
INSERT INTO g467_t SELECT n_nationkey, n_name, 'unknown' FROM nation WHERE n_nationkey < 10;
MERGE INTO g467_t t
USING (
  SELECT n.n_nationkey AS k, n.n_name AS name, r.r_name AS region
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
) s ON t.k = s.k
WHEN MATCHED THEN UPDATE SET region = s.region;
SELECT k, name, region FROM g467_t
