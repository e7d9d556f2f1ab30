-- vector_decimal_3.q: decimal(38,18) as a sort key, group key, join key
-- and filter target — equality matches across trailing-zero scales
-- (key=3.14 and key=3.140 hit the same rows).
DROP TABLE IF EXISTS g952_dec3;
CREATE TABLE g952_dec3 (key DECIMAL(38,18), value INT) USING parquet;
INSERT INTO g952_dec3 VALUES
  (CAST('-4400' AS DECIMAL(38,18)), 4400),
  (CAST('1E+99' AS DECIMAL(38,18)), 0),
  (CAST('0' AS DECIMAL(38,18)), 0),
  (CAST('3.14' AS DECIMAL(38,18)), 3),
  (CAST('3.14' AS DECIMAL(38,18)), 4),
  (CAST('-1.12' AS DECIMAL(38,18)), -1),
  (CAST('1' AS DECIMAL(38,18)), 1),
  (NULL, 0);
SELECT 'grp' AS probe, key, CAST(sum(value) AS BIGINT) AS agg
  FROM g952_dec3 GROUP BY key
UNION ALL
SELECT 'join' AS probe, a.key, CAST(count(*) AS BIGINT) AS agg
  FROM g952_dec3 a JOIN g952_dec3 b ON (a.key = b.key) GROUP BY a.key
UNION ALL
SELECT 'eq314' AS probe, key, CAST(value AS BIGINT) AS agg
  FROM g952_dec3 WHERE key = 3.140
