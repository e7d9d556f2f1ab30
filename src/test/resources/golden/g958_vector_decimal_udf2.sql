-- vector_decimal_udf2.q: the trig/log/exp math functions over a DECIMAL
-- argument (implicit decimal→double at the call) — acos(10) is NaN,
-- log(value, key) mixes decimal and int bases.
DROP TABLE IF EXISTS g958_udf2;
CREATE TABLE g958_udf2 (key DECIMAL(20,10), value INT) USING parquet;
INSERT INTO g958_udf2 VALUES (CAST(10 AS DECIMAL(20,10)), 10),
                             (CAST(3.14 AS DECIMAL(20,10)), 3);
SELECT round(atan(key), 10) AS at, round(cos(key), 10) AS c,
       round(sin(key), 10) AS s, round(tan(key), 10) AS t,
       round(radians(key), 10) AS r,
       round(exp(key), 6) AS e, round(ln(key), 10) AS l,
       round(log(key), 10) AS lg, round(log(key, key), 10) AS lkk,
       round(log(key, value), 10) AS lkv, round(log(value, key), 10) AS lvk,
       round(log10(key), 10) AS l10, round(sqrt(key), 10) AS sq,
       isnan(acos(key)) AS acos_nan, isnan(asin(key)) AS asin_nan
FROM g958_udf2 WHERE key = 10
