-- udf_round_2.q + udf_round_3.q: round() at the edges — NaN stays NaN
-- at any digit count, division by zero is NULL (Hive's divide returns
-- null on a zero divisor, so round(1/0) is NULL, not Infinity), and
-- type-boundary values (tinyint/smallint extremes) round to themselves.
DROP TABLE IF EXISTS g1006_t;
CREATE TABLE g1006_t (n DOUBLE) USING parquet;
INSERT OVERWRITE TABLE g1006_t
  SELECT CAST('NaN' AS DOUBLE) FROM nation LIMIT 1;
SELECT isnan(n) AS n_nan, isnan(round(n, 1)) AS r1_nan,
       isnan(round(n)) AS r0_nan,
       CAST(round(1/0) AS STRING) AS inf0,
       CAST(round(1/0, 2) AS STRING) AS inf2,
       round(-128) AS ty_min, round(127) AS ty_max,
       round(-32768) AS si_min, round(32767) AS si_max,
       round(-129) AS under_ty, round(128) AS over_ty,
       round(126.1) AS d1, round(126.7) AS d2,
       round(32766.1) AS d3, round(32766.7) AS d4
FROM g1006_t
