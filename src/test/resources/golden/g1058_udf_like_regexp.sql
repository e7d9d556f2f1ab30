-- reference: ql/src/test/queries/clientpositive/udf1.q (the LIKE / RLIKE
-- / REGEXP_REPLACE battery, escape forms included) + udf2.q (trim
-- family over a padded literal) + udf3.q (aggregates over empty input).
DROP TABLE IF EXISTS g1058_empty;
CREATE TABLE g1058_empty (c STRING) USING parquet;
SELECT 'a' LIKE '%a%' AS l1, 'b' LIKE '%a%' AS l2, 'ab' LIKE '%a%' AS l3,
  'ab' LIKE '%a_' AS l4, '%_' LIKE '\\%\\_' AS l5, 'ab' LIKE '\\%\\_' AS l6,
  'ab' LIKE '_a%' AS l7, 'ab' LIKE 'a' AS l8,
  '' RLIKE '.*' AS r1, 'a' RLIKE '[ab]' AS r2, '' RLIKE '[ab]' AS r3,
  'hadoop' RLIKE '[a-z]*' AS r4, 'hadoop' RLIKE 'o*' AS r5,
  REGEXP_REPLACE('abc', 'b', 'c') AS g1, REGEXP_REPLACE('abc', 'z', 'a') AS g2,
  REGEXP_REPLACE('abbbb', 'bb', 'b') AS g3,
  REGEXP_REPLACE('hadoop', '(.)[a-z]*', '$1ive') AS g4,
  REGEXP_REPLACE('hadoopAAA', 'A.*', '') AS g5,
  'abc' RLIKE '' AS r6,
  concat('[', trim('  abc  '), ']') AS t1,
  concat('[', ltrim('  abc  '), ']') AS t2,
  concat('[', rtrim('  abc  '), ']') AS t3,
  (SELECT count(1) FROM g1058_empty) AS empty_cnt,
  (SELECT sum(length(c)) FROM g1058_empty) AS empty_sum;
