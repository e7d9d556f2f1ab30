-- union24.q shape: union of pre-aggregated tables where the last branch
-- re-aggregates inline
DROP TABLE IF EXISTS g363_src2;
DROP TABLE IF EXISTS g363_src3;
CREATE TABLE g363_src2 AS SELECT n_regionkey AS key, count(1) AS count FROM nation GROUP BY n_regionkey;
CREATE TABLE g363_src3 AS SELECT * FROM g363_src2;
SELECT s.key, s.count FROM (
  SELECT key, count FROM g363_src2 WHERE key < 3
  UNION ALL
  SELECT key, count FROM g363_src3 WHERE key < 3
  UNION ALL
  SELECT key, count(1) AS count FROM g363_src3 WHERE key < 3 GROUP BY key
) s
