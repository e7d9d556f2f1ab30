-- vectorized_math_funcs.q: round/bround/floor/ceil/exp/ln/log10/sqrt/
-- abs/sign/sin-cos bounds, with the %.6g canonical form absorbing
-- float noise.
SELECT ROUND(2.5) AS r25, ROUND(-2.5) AS rn25, BROUND(2.5) AS br25, BROUND(3.5) AS br35,
  FLOOR(-1.1) AS fl, CEIL(-1.1) AS ce,
  ROUND(EXP(1) * 1000000) / 1000000 AS e1,
  ROUND(LN(EXP(2)) * 1000000) / 1000000 AS ln2,
  ROUND(LOG10(1000) * 1000000) / 1000000 AS l10,
  ROUND(SQRT(16)) AS sq, ABS(-7.5) AS ab, SIGN(-3) AS sg,
  ROUND(POW(2, 10)) AS p10, ROUND(SIN(0) * 1000000) / 1000000 AS s0,
  CAST(HEX(255) AS STRING) AS hx, CONV('ff', 16, 10) AS cv
