-- vector_decimal_2.q: decimal(18,9) read back through every numeric
-- cast for both a small (17.29) and a large (3404045.5044003) stored
-- value — integer casts TRUNCATE toward zero and WRAP two's-complement
-- (tinyint of 3404045 = 13, smallint = -19315 in the reference .q.out);
-- plus the stem's literal-cast tail (float literal, timestamp→decimal,
-- boolean→decimal, 3Y tinyint literal).
DROP TABLE IF EXISTS g951_dec2;
CREATE TABLE g951_dec2 (t DECIMAL(18,9)) USING parquet;
INSERT OVERWRITE TABLE g951_dec2
  SELECT CAST('17.29' AS DECIMAL(4,2)) FROM nation LIMIT 1;
INSERT INTO g951_dec2
  SELECT CAST('3404045.5044003' AS DECIMAL(18,9)) FROM nation LIMIT 1;
SELECT cast(t AS boolean) AS b, cast(t AS tinyint) AS ty,
       cast(t AS smallint) AS sm, cast(t AS int) AS i,
       cast(t AS bigint) AS bi, cast(t AS float) AS f,
       cast(t AS double) AS d, cast(t AS string) AS s,
       cast(3.14 AS decimal(4,2)) AS lit,
       cast(cast(3.14 AS float) AS decimal(4,2)) AS flit,
       cast(cast('2012-12-19 11:12:19.1234567' AS timestamp)
            AS decimal(30,8)) AS tsd,
       cast(true AS decimal(10,0)) AS bd,
       cast(3Y AS decimal(10,0)) AS yd
FROM g951_dec2
