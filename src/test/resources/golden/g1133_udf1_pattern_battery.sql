-- reference: ql/src/test/queries/clientpositive/udf1.q — the LIKE /
-- RLIKE / REGEXP_REPLACE battery: wildcard and escaped-wildcard LIKE,
-- empty-string and empty-pattern RLIKE, group backreferences, and
-- empty-pattern replacement.
SELECT 'a' LIKE '%a%' AS l1, 'b' LIKE '%a%' AS l2,
       'ab' LIKE '%a_' AS l3, '%_' LIKE '\\%\\_' AS l4,
       'ab' LIKE '\\%\\_' AS l5, 'ab' LIKE '_a%' AS l6,
       '' RLIKE '.*' AS r1, 'a' RLIKE '[ab]' AS r2,
       '' RLIKE '[ab]' AS r3, 'hadoop' RLIKE '[a-z]*' AS r4,
       'hadoop' RLIKE 'o*' AS r5, 'abc' RLIKE '' AS r6,
       REGEXP_REPLACE('abc', 'b', 'c') AS p1,
       REGEXP_REPLACE('abc', 'z', 'a') AS p2,
       REGEXP_REPLACE('abbbb', 'bb', 'b') AS p3,
       REGEXP_REPLACE('hadoop', '(.)[a-z]*', '$1ive') AS p4,
       REGEXP_REPLACE('hadoopAAA', 'A.*', '') AS p5,
       REGEXP_REPLACE('abc', '', 'A') AS p6
FROM nation TABLESAMPLE (1 ROWS)
