-- udf battery (regexp/like/url/levenshtein/sentences): clientpositive/
-- udf_regexp.q, udf_regexp_extract.q, udf_regexp_replace.q, udf_rlike.q,
-- udf_like.q, udf_parse_url.q, udf_levenshtein.q, udf_sentences.q,
-- udf_in.q, udf_or.q, udf_and.q.
SELECT
  ('fofo' RLIKE '^fo') AS rl1, ('fo' RLIKE '^fo$') AS rl2,
  ('fofo' REGEXP '^fo') AS rx1,
  regexp_extract('100-200', '(\\d+)-(\\d+)', 1) AS re1,
  regexp_extract('foothebar', 'foo(.*?)(bar)', 2) AS re2,
  regexp_replace('100-200', '(\\d+)', 'num') AS rr1,
  regexp_replace('fofofo', 'fo', 'ba') AS rr2,
  ('abc' LIKE 'a%') AS lk1, ('abc' LIKE '_b_') AS lk2,
  ('abc' LIKE 'b%') AS lk3, ('a%c' LIKE 'a\\%c') AS lk4,
  parse_url('http://facebook.com/path1/p.php?k1=v1&k2=v2#Ref1', 'HOST') AS pu1,
  parse_url('http://facebook.com/path1/p.php?k1=v1&k2=v2#Ref1', 'PATH') AS pu2,
  parse_url('http://facebook.com/path1/p.php?k1=v1&k2=v2#Ref1', 'QUERY') AS pu3,
  parse_url('http://facebook.com/path1/p.php?k1=v1&k2=v2#Ref1', 'REF') AS pu4,
  parse_url('http://facebook.com/path1/p.php?k1=v1&k2=v2#Ref1', 'QUERY', 'k2') AS pu5,
  parse_url('http://facebook.com/path1/p.php?k1=v1&k2=v2#Ref1', 'PROTOCOL') AS pu6,
  levenshtein('kitten', 'sitting') AS lv1, levenshtein('', 'x') AS lv2,
  cast(sentences('Hello there! How are you today?') AS string) AS sn1,
  (2 IN (1, 2, 3)) AS in1, (9 IN (1, 2, 3)) AS in2,
  (true OR false) AS or1, (true AND false) AS an1
