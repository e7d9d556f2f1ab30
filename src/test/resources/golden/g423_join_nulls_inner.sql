-- join_nulls.q battery (inner-join half): NULL keys never match in
-- equi-joins, including the no-ON cartesian form. Tagged UNION ALL so one
-- golden pins the whole battery.
DROP TABLE IF EXISTS g423_in;
CREATE TABLE g423_in (key INT, value INT);
INSERT INTO g423_in VALUES (NULL, 35), (48, NULL), (100, 100), (NULL, NULL), (10, 35), (48, 35);
SELECT 'cart' AS tag, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g423_in a JOIN g423_in b
UNION ALL
SELECT 'kv', a.key, a.value, b.key, b.value FROM g423_in a JOIN g423_in b ON a.key = b.value
UNION ALL
SELECT 'kk', a.key, a.value, b.key, b.value FROM g423_in a JOIN g423_in b ON a.key = b.key
UNION ALL
SELECT 'vv', a.key, a.value, b.key, b.value FROM g423_in a JOIN g423_in b ON a.value = b.value
UNION ALL
SELECT 'both', a.key, a.value, b.key, b.value FROM g423_in a JOIN g423_in b ON a.value = b.value AND a.key = b.key
