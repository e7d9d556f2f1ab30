SELECT p_partkey, pmod(-p_partkey, 7) AS pm, conv(cast(p_partkey AS string), 10, 16) AS cv,
  shiftleft(p_partkey, 2) AS sl, bround(p_retailprice, 1) AS br,
  factorial(p_partkey % 6) AS fa, round(cbrt(p_partkey), 4) AS cb,
  round(hypot(p_partkey, 3), 4) AS hy, round(log2(p_partkey + 1), 4) AS l2
FROM part WHERE p_partkey <= 25
