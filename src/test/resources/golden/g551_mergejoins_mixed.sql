-- mergejoins_mixed.q: chains mixing inner with LEFT/RIGHT/FULL OUTER over
-- the same and different keys — merge-join planning must keep each hop's
-- null-production rules. Three representative chains, tagged; the value
-- key hop (b.value = c.key) never matches, forcing null fan-through.
DROP TABLE IF EXISTS g551_a;
CREATE TABLE g551_a USING parquet AS
  SELECT CAST(n_nationkey % 4 AS STRING) AS key, concat('v', n_nationkey % 2) AS value
  FROM nation WHERE n_nationkey < 8;
SELECT 'l_then_r' AS tag, a.key AS ak, b.key AS bk, c.key AS ck, d.key AS dk
FROM g551_a a JOIN g551_a b ON (a.key = b.key)
LEFT OUTER JOIN g551_a c ON (b.value = c.key)
RIGHT OUTER JOIN g551_a d ON (a.key = d.key)
UNION ALL
SELECT 'r_then_l', a.key, b.key, c.key, d.key
FROM g551_a a JOIN g551_a b ON (a.key = b.key)
RIGHT OUTER JOIN g551_a c ON (b.value = c.key)
LEFT OUTER JOIN g551_a d ON (a.key = d.key)
UNION ALL
SELECT 'full_full', a.key, b.key, c.key, d.key
FROM g551_a a JOIN g551_a b ON (a.key = b.key)
FULL OUTER JOIN g551_a c ON (b.value = c.key)
FULL OUTER JOIN g551_a d ON (a.key = d.key)
