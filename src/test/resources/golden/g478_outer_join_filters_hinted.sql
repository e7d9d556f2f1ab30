-- auto_join_filters.q (hinted half): MAPJOIN hints on outer joins whose
-- ON clauses carry range predicates over both sides.
DROP TABLE IF EXISTS g478_in;
CREATE TABLE g478_in (key INT, value INT);
INSERT INTO g478_in VALUES (NULL, 40), (48, NULL), (100, 100), (10, 35), (48, 35), (200, 40);
SELECT /*+ MAPJOIN(b) */ 'loj' AS tag, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g478_in a LEFT OUTER JOIN g478_in b
  ON a.key = b.key AND a.key > 40 AND a.value > 50 AND b.key > 40 AND b.value > 50
UNION ALL
SELECT /*+ MAPJOIN(a) */ 'roj', a.key, a.value, b.key, b.value
FROM g478_in a RIGHT OUTER JOIN g478_in b
  ON a.key = b.key AND a.key > 40 AND a.value > 50 AND b.key > 40 AND b.value > 50
