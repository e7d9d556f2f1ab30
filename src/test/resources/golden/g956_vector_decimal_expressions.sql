-- vector_decimal_expressions.q: the decimal expression battery —
-- mixed-precision +/-/*//%, int-family casts, boolean/double/float/
-- string/timestamp casts — over decimals derived from a double column
-- ((x*22.1)/37 at (20,10), (x*9.3)/13 at (23,14)). Ordered (the stem's
-- bare LIMIT 10 is nondeterministic under any engine).
DROP TABLE IF EXISTS g956_dt;
CREATE TABLE g956_dt USING parquet AS
  SELECT CAST(l_extendedprice AS DOUBLE) AS cdouble,
         CAST(((l_extendedprice * 22.1) / 37) AS DECIMAL(20,10)) AS cdecimal1,
         CAST(((l_extendedprice * 9.3) / 13) AS DECIMAL(23,14)) AS cdecimal2
  FROM lineitem WHERE l_orderkey < 200;
SELECT cdecimal1 + cdecimal2 AS add2, cdecimal1 - (2 * cdecimal2) AS sub2,
       round((cdecimal1 + 2.34) / cdecimal2, 10) AS div2,
       round(cdecimal1 * (cdecimal2 / 3.4), 6) AS mul2,
       cdecimal1 % 10 AS mod10,
       CAST(cdecimal1 AS INT) AS i1, CAST(cdecimal2 AS SMALLINT) AS sm2,
       CAST(cdecimal2 AS TINYINT) AS ty2, CAST(cdecimal1 AS BIGINT) AS bi1,
       CAST(cdecimal1 AS BOOLEAN) AS b1, CAST(cdecimal2 AS DOUBLE) AS d2,
       CAST(cdecimal1 AS FLOAT) AS f1, CAST(cdecimal2 AS STRING) AS s2,
       CAST(CAST(cdecimal1 AS TIMESTAMP) AS STRING) AS ts1
FROM g956_dt
WHERE cdecimal1 > 0 AND cdecimal1 < 12345.5678 AND cdecimal2 != 0
  AND cdecimal2 > 1000 AND cdouble IS NOT NULL
ORDER BY cdecimal1 LIMIT 10
