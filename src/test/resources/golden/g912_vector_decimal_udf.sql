-- vector_decimal_udf.q: the arithmetic-operator battery over a decimal
-- column against literals and itself — +, -, unary -, *, /, %, and
-- abs/floor/ceil/round; division by zero yields NULL, modulo keeps the
-- dividend's sign (Hive/Java semantics).
DROP TABLE IF EXISTS g912_du;
CREATE TABLE g912_du (key DECIMAL(20,10), value INT) USING parquet;
INSERT INTO g912_du VALUES
  (3.14, 3), (-3.14, -3), (200, 200), (0.5, 0), (NULL, 1);
SELECT key,
       key + 1 AS p1, key - 1 AS m1, -key AS neg,
       key * value AS kv, key / value AS kdv,
       key % 3 AS mod3, abs(key) AS ab,
       floor(key) AS fl, ceil(key) AS ce, round(key, 1) AS r1
FROM g912_du ORDER BY key NULLS FIRST
