-- reference: ql/src/test/queries/clientpositive/udf_round.q — round()
-- across NULLs, infinities-to-NaN shapes, positive and NEGATIVE scale
-- (powers-of-ten rounding), and sub-double precision edges.
SELECT
  round(CAST(NULL AS DOUBLE)) AS r_null,
  round(CAST(NULL AS DOUBLE), 0) AS r_null0,
  round(125, CAST(NULL AS INT)) AS r_nullscale,
  round(55555) AS a0, round(55555, 1) AS a1,
  round(55555, -1) AS am1, round(55555, -2) AS am2,
  round(55555, -3) AS am3, round(55555, -4) AS am4, round(55555, -5) AS am5,
  round(CAST(125.315 AS DOUBLE), 2) AS b2,
  round(CAST(-125.315 AS DOUBLE), 2) AS bn2,
  round(CAST(125.315 AS DOUBLE), -2) AS bm2,
  round(CAST(3.141592653589793 AS DOUBLE), 3) AS pi3,
  round(CAST(3.141592653589793 AS DOUBLE), 10) AS pi10
FROM nation TABLESAMPLE (1 ROWS)
