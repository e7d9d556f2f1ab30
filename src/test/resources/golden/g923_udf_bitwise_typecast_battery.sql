-- udf battery (bitwise/arithmetic/cast/misc): clientpositive/
-- udf_bitwise_and.q, udf_bitwise_or.q, udf_bitwise_xor.q,
-- udf_bitwise_not.q, udf_bitwise_shiftleft.q, udf_bitwise_shiftright.q,
-- udf_bitwise_shiftrightunsigned.q, udf_div.q, udf_divide.q,
-- udf_modulo.q, udf_pmod.q, udf_factorial.q, udf_cbrt.q, udf_bigint.q,
-- udf_double.q, udf_float.q, udf_boolean.q, udf_int.q, udf_smallint.q,
-- udf_tinyint.q, udf_string.q, udf_add.q, udf_subtract.q,
-- udf_multiply.q (Hive pmod is non-negative: pmod(-7,3)=2).
SELECT
  (3 & 5) AS ba1, (3 | 5) AS bo1, (3 ^ 5) AS bx1, (~3) AS bn1,
  shiftleft(2, 2) AS sl1, shiftright(8, 2) AS sr1,
  shiftrightunsigned(-8, 2) AS sru1,
  (17 div 3) AS dv1, round(17 / 3, 6) AS dv2, (17 % 3) AS md1,
  pmod(-7, 3) AS pm1, pmod(7, 3) AS pm2,
  factorial(5) AS fa1, round(cbrt(27.0), 6) AS cb1,
  cast('5' AS bigint) + 1 AS ct1, cast('2.5' AS double) * 2 AS ct2,
  cast('3.9' AS float) AS ct3, cast(1 AS boolean) AS ct4,
  cast('12' AS int) AS ct5, cast('12' AS smallint) AS ct6,
  cast('12' AS tinyint) AS ct7, cast(77 AS string) AS ct8,
  (1 + 2) AS ar1, (5 - 7) AS ar2, (6 * 7) AS ar3
