-- mapjoin_test_outer.q: RIGHT OUTER into INNER over small derived tables
-- (one row deliberately matching nothing), bare vs MAPJOIN-hinted — the
-- broadcast must keep the outer padding, and the sentinel row must
-- survive the outer leg but die at the inner hop only if unmatched.
DROP TABLE IF EXISTS g577_d1;
DROP TABLE IF EXISTS g577_d2;
CREATE TABLE g577_d1 USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, concat('val_', n_nationkey) AS value
  FROM nation WHERE n_nationkey < 8
  UNION ALL SELECT '333444', '555666';
CREATE TABLE g577_d2 USING parquet AS SELECT * FROM g577_d1;
SELECT 'plain' AS tag, s1.key AS k1, s2.key AS k2, s3.key AS k3
FROM (SELECT * FROM g577_d1 WHERE key < '4') s1
RIGHT OUTER JOIN g577_d1 s2 ON (s1.key = s2.key)
JOIN g577_d2 s3 ON (s2.key = s3.key)
UNION ALL
SELECT /*+ mapjoin(s1, s2) */ 'hinted', s1.key, s2.key, s3.key
FROM (SELECT * FROM g577_d1 WHERE key < '4') s1
RIGHT OUTER JOIN g577_d1 s2 ON (s1.key = s2.key)
JOIN g577_d2 s3 ON (s2.key = s3.key)
