-- cast_to_int.q: Hive casts string floats to integer types by parsing
-- the double and truncating ('1.4'→1), out-of-range wraps, and a
-- non-numeric string is NULL — Spark's native string→int cast would
-- return NULL for '1.4' (the engine's Hive-cast drift rule pins this).
SELECT
  cast('1' AS float) AS f1, cast('1.4' AS float) AS f2,
  cast('1.6' AS float) AS f3,
  cast('1' AS int) AS i1, cast('1.4' AS int) AS i2,
  cast('1.6' AS int) AS i3,
  cast('1' AS tinyint) AS t1, cast('1.4' AS tinyint) AS t2,
  cast('1' AS smallint) AS s1, cast('1.4' AS smallint) AS s2,
  cast('1' AS bigint) AS b1, cast('1.4' AS bigint) AS b2,
  cast('-128' AS tinyint) AS t3,
  cast('x' AS int) AS n1, cast('' AS int) AS n2,
  cast('2147483647' AS int) AS mx1
