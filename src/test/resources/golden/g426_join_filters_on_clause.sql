-- join_filters.q battery: non-join predicates inside the ON clause. For
-- INNER they filter both sides; for OUTER they only gate the match (rows
-- survive with NULL pads) — the classic Hive-semantics trap.
DROP TABLE IF EXISTS g426_in;
CREATE TABLE g426_in (key INT, value INT);
INSERT INTO g426_in VALUES (NULL, 40), (48, NULL), (100, 100), (10, 35), (48, 35), (200, 40);
SELECT 'inner' AS tag, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g426_in a JOIN g426_in b ON a.key = b.key AND a.key > 40 AND b.value > 50
UNION ALL
SELECT 'loj', a.key, a.value, b.key, b.value
FROM g426_in a LEFT OUTER JOIN g426_in b ON a.key = b.key AND a.key > 40 AND b.value > 50
UNION ALL
SELECT 'roj', a.key, a.value, b.key, b.value
FROM g426_in a RIGHT OUTER JOIN g426_in b ON a.key = b.key AND a.key > 40 AND b.value > 50
UNION ALL
SELECT 'foj', a.key, a.value, b.key, b.value
FROM g426_in a FULL OUTER JOIN g426_in b ON a.key = b.key AND a.key > 40 AND b.value > 50
UNION ALL
SELECT 'loj_left_only_pred', a.key, a.value, b.key, b.value
FROM g426_in a LEFT OUTER JOIN g426_in b ON a.key = b.key AND a.value < 40
