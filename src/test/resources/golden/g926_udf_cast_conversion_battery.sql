-- udf battery (to_* conversions + xpath family): clientpositive/
-- udf_to_boolean.q, udf_to_byte.q, udf_to_short.q, udf_to_long.q,
-- udf_to_double.q, udf_to_float.q, udf_to_string.q, udf_boolean.q,
-- udf_xpath.q, udf_xpath_boolean.q, udf_xpath_int.q, udf_xpath_long.q,
-- udf_xpath_short.q, udf_xpath_float.q, udf_xpath_double.q,
-- udf_xpath_string.q (Hive string→boolean: only 'TRUE' is true — the
-- StrictChecks drift guard's documented semantics ride the cast here).
SELECT
  cast('1' AS tinyint) AS tb1, cast(128 AS tinyint) AS tb2,
  cast('300' AS smallint) AS ts1,
  cast('9223372036854775807' AS bigint) AS tl1,
  cast('1.5' AS double) AS td1, cast('1.5' AS float) AS tf1,
  cast(1.99 AS int) AS ti1, cast(-1.99 AS int) AS ti2,
  cast(true AS string) AS st1, cast(42 AS string) AS st2,
  cast(0 AS boolean) AS bo1, cast(5 AS boolean) AS bo2,
  xpath_string('<a><b>bb</b><c>cc</c></a>', 'a/c') AS xs1,
  xpath_int('<a>8</a>', 'a') AS xi1,
  xpath_long('<a>123456789012</a>', 'a') AS xl1,
  xpath_short('<a>12</a>', 'a') AS xsh1,
  xpath_double('<a><b>1</b><b>2</b></a>', 'sum(a/b)') AS xd1,
  xpath_float('<a>1.5</a>', 'a') AS xf1,
  xpath_boolean('<a><b>1</b></a>', 'a/b') AS xb1,
  xpath_boolean('<a><b>1</b></a>', 'a/c') AS xb2,
  cast(xpath('<a><b>b1</b><b>b2</b></a>', 'a/b/text()') AS string) AS xp1
