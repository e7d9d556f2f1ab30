-- vectorized_string_funcs.q: the substr/case/trim/concat battery (Hive
-- substr is 1-based; substr(s, 0, n) behaves like 1; negative start
-- counts from the end).
SELECT s_suppkey,
  SUBSTR(s_name, 1, 2) AS sub12, SUBSTR(s_name, 2) AS sub2,
  SUBSTR(s_name, -3) AS sub_neg, SUBSTR(s_name, 0, 4) AS sub0,
  LOWER(s_name) AS lo, UPPER(s_name) AS up_c,
  LENGTH(s_name) AS len, TRIM(CONCAT(' ', s_name, ' ')) AS trimmed,
  LTRIM(CONCAT('  x', s_name)) AS lt, RTRIM(CONCAT(s_name, 'x  ')) AS rt,
  CONCAT('>', s_name, '<') AS wrapped
FROM supplier WHERE s_suppkey < 4
