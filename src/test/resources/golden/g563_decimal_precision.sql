-- decimal_precision.q: DECIMAL(20,10) arithmetic — +/-/*, division at
-- three divisors (scale expansion), dec*dec (precision doubling capped),
-- avg/sum result types.
DROP TABLE IF EXISTS g563_dec;
CREATE TABLE g563_dec (dec DECIMAL(20,10)) USING parquet;
INSERT INTO g563_dec VALUES
  (0), (1), (-1), (0.33), (-0.33), (12345678.0123456789),
  (-12345678.0123456789), (1234567890.123456789), (NULL);
SELECT 'pm' AS tag, CAST(dec AS STRING) AS a, CAST(dec + 1 AS STRING) AS b, CAST(dec - 1 AS STRING) AS c FROM g563_dec
UNION ALL
SELECT 'muldiv', CAST(dec AS STRING), CAST(dec * 2 AS STRING), CAST(dec / 3 AS STRING) FROM g563_dec
UNION ALL
SELECT 'div927', CAST(dec AS STRING), CAST(dec / 9 AS STRING), CAST(dec / 27 AS STRING) FROM g563_dec
UNION ALL
SELECT 'square', CAST(dec AS STRING), CAST(dec * dec AS STRING), '' FROM g563_dec
UNION ALL
SELECT 'aggs', CAST(avg(dec) AS STRING), CAST(sum(dec) AS STRING), CAST(count(dec) AS STRING) FROM g563_dec
