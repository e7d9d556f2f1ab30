-- join_filters_overlap.q (HIVE-3411): ON-clause filter predicates over
-- a SINGLE alias shared by two outer joins — each join keeps its own
-- filter, rows that fail one join's filter still null-extend without
-- corrupting the other join's match.
DROP TABLE IF EXISTS g1004_a;
CREATE TABLE g1004_a USING parquet AS
  SELECT 100 AS key, v AS value
  FROM (SELECT explode(array(40, 50, 60)) AS v) t;
SELECT 'overlap_a' AS probe,
       a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv,
       c.key AS ck, c.value AS cv
FROM g1004_a a
LEFT OUTER JOIN g1004_a b
  ON (a.key = b.key AND a.value = 50 AND b.value = 50)
LEFT OUTER JOIN g1004_a c
  ON (a.key = c.key AND a.value = 60 AND c.value = 60)
UNION ALL
SELECT 'overlap_b' AS probe,
       a.key, a.value, b.key, b.value, c.key, c.value
FROM g1004_a a
RIGHT OUTER JOIN g1004_a b
  ON (a.key = b.key AND a.value = 50 AND b.value = 50)
LEFT OUTER JOIN g1004_a c
  ON (b.key = c.key AND b.value = 60 AND c.value = 60)
UNION ALL
SELECT 'two_filters' AS probe,
       a.key, a.value, b.key, b.value, c.key, c.value
FROM g1004_a a
RIGHT OUTER JOIN g1004_a b
  ON (a.key = b.key AND a.value = 50 AND b.value = 50 AND b.value > 10)
LEFT OUTER JOIN g1004_a c
  ON (b.key = c.key AND b.value = 60 AND b.value > 20 AND c.value = 60)
