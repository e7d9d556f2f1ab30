-- implicit_cast1.q / type-coercion battery (ANSI off, Hive-permissive).
-- String-vs-numeric comparison goes via DOUBLE, matching the reference's
-- FunctionRegistry.java:702 getCommonClassForComparison ('1e2' = 100 is
-- TRUE — sci_eq_i below; closed by plans/HiveSemantics.CompareViaDouble
-- in round 10). Junk strings still NULL out through the double cast.
-- Arithmetic ('5'+3) coerces through double on both engines.
SELECT
  '10' = 10 AS s_eq_i,
  '1e2' = 100 AS sci_eq_i,
  '10.0' = 10 AS sdec_eq_i,
  '010' = 10 AS pad_eq_i,
  'abc' = 10 AS junk_eq_i,
  '5' + 3 AS s_plus_i,
  '5' + '3' AS s_plus_s,
  '2' * 3.5 AS s_times_d,
  10 / '4' AS i_div_s,
  cast('12abc' AS INT) AS bad_int,
  cast('  7 ' AS INT) AS trim_int,
  cast(3.99 AS INT) AS trunc_int,
  cast(-3.99 AS INT) AS trunc_neg,
  cast(true AS INT) AS bool_int,
  1 + cast('2' AS TINYINT) AS tiny_widen
