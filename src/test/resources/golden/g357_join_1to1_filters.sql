-- join_1to1.q shapes: FULL OUTER JOIN with non-key filter predicates inside
-- ON (both sides), with and without a second key equality
DROP TABLE IF EXISTS g357_a;
DROP TABLE IF EXISTS g357_b;
CREATE TABLE g357_a AS SELECT * FROM VALUES
  (5, 10005, 66), (15, 10015, 66), (25, 10025, 88), (35, 10035, 88),
  (45, 10045, 66), (55, 10055, 12), (65, 10065, 66), (null, 10075, 88)
  AS t(key1, key2, value);
CREATE TABLE g357_b AS SELECT * FROM VALUES
  (5, 10005, 66), (15, 10015, 88), (25, 10025, 66), (45, 10045, 66),
  (55, 10055, 12), (75, 10075, 66), (null, 10085, 88)
  AS t(key1, key2, value);
SELECT a.key1 AS ak1, a.value AS av, b.key1 AS bk1, b.value AS bv, 'fo' AS tag
FROM g357_a a FULL OUTER JOIN g357_b b ON a.key1 = b.key1
UNION ALL
SELECT a.key1 AS ak1, a.value AS av, b.key1 AS bk1, b.value AS bv, 'fo_filter'
FROM g357_a a FULL OUTER JOIN g357_b b
  ON a.key1 = b.key1 AND a.value = 66 AND b.value = 66
UNION ALL
SELECT a.key1 AS ak1, a.value AS av, b.key1 AS bk1, b.value AS bv, 'fo_2key_filter'
FROM g357_a a FULL OUTER JOIN g357_b b
  ON a.key1 = b.key1 AND a.key2 = b.key2 AND a.value = 66 AND b.value = 66
