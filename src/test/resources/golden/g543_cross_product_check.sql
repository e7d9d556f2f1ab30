-- cross_product_check_2.q: shapes the cross-product warning checker
-- flags — a join with a constant-true residual (WHERE 1 = 1), and a true
-- cartesian of two GROUPED subqueries — both must still execute and
-- produce exact results (the small grouped sides are broadcastable).
DROP TABLE IF EXISTS g543_a;
DROP TABLE IF EXISTS g543_b;
CREATE TABLE g543_a USING parquet AS
  SELECT CAST(n_nationkey % 8 AS STRING) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
CREATE TABLE g543_b USING parquet AS
  SELECT * FROM g543_a ORDER BY key, value LIMIT 10;
SELECT 'const_true' AS v, d1.key AS k1, CAST(count(*) AS STRING) AS k2
FROM g543_b d1 JOIN g543_b d2 ON d1.key = d2.key
WHERE 1 = 1 GROUP BY d1.key
UNION ALL
SELECT 'cartesian_grouped', ss.key, od1.key
FROM (SELECT g543_a.key FROM g543_a GROUP BY key) ss
JOIN (SELECT d1.key FROM g543_b d1 JOIN g543_b d2 ON d1.key = d2.key
      WHERE 1 = 1 GROUP BY d1.key) od1
