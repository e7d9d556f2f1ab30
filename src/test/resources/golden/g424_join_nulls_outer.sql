-- join_nulls.q battery (outer half): LEFT/RIGHT/FULL OUTER over NULL keys —
-- unmatched sides pad with NULL, NULL keys never equi-match.
DROP TABLE IF EXISTS g424_in;
CREATE TABLE g424_in (key INT, value INT);
INSERT INTO g424_in VALUES (NULL, 35), (48, NULL), (100, 100), (NULL, NULL), (10, 35), (48, 35);
SELECT 'loj_kv' AS tag, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g424_in a LEFT OUTER JOIN g424_in b ON a.key = b.value
UNION ALL
SELECT 'loj_kk', a.key, a.value, b.key, b.value FROM g424_in a LEFT OUTER JOIN g424_in b ON a.key = b.key
UNION ALL
SELECT 'roj_vv', a.key, a.value, b.key, b.value FROM g424_in a RIGHT OUTER JOIN g424_in b ON a.value = b.value
UNION ALL
SELECT 'roj_both', a.key, a.value, b.key, b.value FROM g424_in a RIGHT OUTER JOIN g424_in b ON a.key = b.key AND a.value = b.value
UNION ALL
SELECT 'foj_kk', a.key, a.value, b.key, b.value FROM g424_in a FULL OUTER JOIN g424_in b ON a.key = b.key
UNION ALL
SELECT 'foj_vv', a.key, a.value, b.key, b.value FROM g424_in a FULL OUTER JOIN g424_in b ON a.value = b.value
UNION ALL
SELECT 'foj_both', a.key, a.value, b.key, b.value FROM g424_in a FULL OUTER JOIN g424_in b ON a.value = b.value AND a.key = b.key
