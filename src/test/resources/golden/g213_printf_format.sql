-- printf/format_number/conv numeric-text dialect
SELECT n_nationkey,
  printf('%03d:%s', n_nationkey, n_name) AS pf,
  format_number(n_nationkey * 1234.567, 2) AS fn,
  conv(CAST(n_nationkey AS STRING), 10, 16) AS c16,
  conv(CAST(n_nationkey AS STRING), 10, 2) AS c2,
  space(2) AS sp, chr(65 + n_nationkey % 26) AS ch
FROM nation WHERE n_nationkey <= 10
