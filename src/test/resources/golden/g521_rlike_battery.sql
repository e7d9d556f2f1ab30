-- udf_rlike / regexp battery: anchors, classes, alternation, escaping,
-- and the regexp synonym.
SELECT
  'NATION_7' RLIKE '^NATION_[0-9]$' AS anchored,
  'NATION_17' RLIKE '^NATION_[0-9]$' AS anchored_miss,
  'abc123' RLIKE '[a-z]+[0-9]+' AS classes,
  'foo.bar' RLIKE 'foo\\.bar' AS escaped_dot,
  'fooxbar' RLIKE 'foo\\.bar' AS escaped_dot_miss,
  'hello' REGEXP 'h(e|a)llo' AS alternation,
  'Hello' RLIKE 'hello' AS case_sensitive,
  regexp_replace('a1b2c3', '[0-9]', '#') AS replaced,
  regexp_extract('key=val;x=y', 'key=([^;]+)', 1) AS extracted
