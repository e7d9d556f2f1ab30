-- join_nulls.q mapjoin-hint half: Hive's /*+ MAPJOIN(t) */ maps onto
-- Spark's broadcast hint (same name accepted); results must be identical
-- to the unhinted battery including null-safe <=> at the end.
DROP TABLE IF EXISTS g425_in;
CREATE TABLE g425_in (key INT, value INT);
INSERT INTO g425_in VALUES (NULL, 35), (48, NULL), (100, 100), (NULL, NULL), (10, 35), (48, 35);
SELECT /*+ MAPJOIN(b) */ 'mj_b_kk' AS tag, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g425_in a JOIN g425_in b ON a.key = b.key
UNION ALL
SELECT /*+ MAPJOIN(a) */ 'mj_a_vv', a.key, a.value, b.key, b.value
FROM g425_in a JOIN g425_in b ON a.value = b.value
UNION ALL
SELECT /*+ MAPJOIN(b) */ 'mj_loj', a.key, a.value, b.key, b.value
FROM g425_in a LEFT OUTER JOIN g425_in b ON a.key = b.key
UNION ALL
SELECT /*+ MAPJOIN(a) */ 'mj_roj', a.key, a.value, b.key, b.value
FROM g425_in a RIGHT OUTER JOIN g425_in b ON a.key = b.key
UNION ALL
SELECT 'nullsafe', a.key, a.value, b.key, b.value
FROM g425_in a JOIN g425_in b ON a.key <=> b.key
