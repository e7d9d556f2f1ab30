-- union27.q/union32.q: UNION branches with different numeric widths and
-- string/varchar promote to the common type; DISTINCT dedupes across
-- branches post-promotion.
SELECT * FROM (
  SELECT CAST(1 AS TINYINT) AS a, 'x' AS b
  UNION SELECT CAST(1 AS BIGINT), 'x'
  UNION SELECT CAST(2.0 AS DOUBLE), 'y'
  UNION ALL SELECT 2, 'y') u
