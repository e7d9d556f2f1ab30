-- vectorized_casts.q: the cast cross-matrix — numeric<->string,
-- boolean->int, double->int truncation-toward-zero, int->boolean,
-- string->boolean (Hive non-empty-is-true, round 10).
SELECT CAST(CAST(3.99 AS DOUBLE) AS INT) AS d_i,
  CAST(-3.99 AS INT) AS dn_i,
  CAST(TRUE AS INT) AS b_i, CAST(FALSE AS INT) AS b0_i,
  CAST(7 AS BOOLEAN) AS i_b, CAST(0 AS BOOLEAN) AS i0_b,
  CAST('42' AS SMALLINT) AS s_si,
  CAST(42 AS STRING) AS i_s,
  CAST(CAST(1.5 AS FLOAT) AS STRING) AS f_s,
  CAST('0' AS BOOLEAN) AS s0_b,
  CAST(CAST(65 AS TINYINT) AS DOUBLE) AS t_d
