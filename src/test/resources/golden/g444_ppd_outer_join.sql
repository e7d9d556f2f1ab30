-- ppd_outer_join1..4.q: the same predicate placed in WHERE vs ON across
-- outer joins — WHERE on the preserved side pushes down; WHERE on the
-- null-padded side converts the join; ON only gates matching.
DROP TABLE IF EXISTS g444_t;
CREATE TABLE g444_t (key INT, value STRING);
INSERT INTO g444_t VALUES (10,'a10'), (15,'a15'), (17,'a17'), (20,'a20'), (25,'a25');
SELECT 'where_left' AS tag, a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
FROM g444_t a LEFT OUTER JOIN g444_t b ON a.key = b.key
WHERE a.key > 10 AND a.key < 20
UNION ALL
SELECT 'where_right_converts', a.key, a.value, b.key, b.value
FROM g444_t a LEFT OUTER JOIN g444_t b ON a.key = b.key
WHERE b.key > 10 AND b.key < 20
UNION ALL
SELECT 'on_only', a.key, a.value, b.key, b.value
FROM g444_t a LEFT OUTER JOIN g444_t b ON a.key = b.key AND b.key > 10 AND b.key < 20
UNION ALL
SELECT 'roj_where_left_converts', a.key, a.value, b.key, b.value
FROM g444_t a RIGHT OUTER JOIN g444_t b ON a.key = b.key
WHERE a.key > 15
