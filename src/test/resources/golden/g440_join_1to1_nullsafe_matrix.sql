-- join_1to1.q: 1:1 join matrix over tables with NULL keys — plain equi
-- vs null-safe <=> on both key columns, inner and full outer.
DROP TABLE IF EXISTS g440_a;
DROP TABLE IF EXISTS g440_b;
CREATE TABLE g440_a (key1 INT, key2 INT, value INT);
CREATE TABLE g440_b (key1 INT, key2 INT, value INT);
INSERT INTO g440_a VALUES (5,10005,66), (10,10010,66), (15,10015,88), (NULL,10050,66), (30,10030,88), (35,NULL,88), (NULL,NULL,66);
INSERT INTO g440_b VALUES (5,10005,66), (10,10010,88), (15,10015,66), (NULL,10050,88), (40,10040,66), (35,NULL,66), (NULL,NULL,88);
SELECT 'eq' AS tag, a.key1 AS ak1, a.key2 AS ak2, a.value AS av, b.key1 AS bk1, b.key2 AS bk2, b.value AS bv
FROM g440_a a JOIN g440_b b ON a.key1 = b.key1 AND a.key2 = b.key2
UNION ALL
SELECT 'nullsafe', a.key1, a.key2, a.value, b.key1, b.key2, b.value
FROM g440_a a JOIN g440_b b ON a.key1 <=> b.key1 AND a.key2 <=> b.key2
UNION ALL
SELECT 'foj_eq', a.key1, a.key2, a.value, b.key1, b.key2, b.value
FROM g440_a a FULL OUTER JOIN g440_b b ON a.key1 = b.key1 AND a.key2 = b.key2
UNION ALL
SELECT 'foj_nullsafe', a.key1, a.key2, a.value, b.key1, b.key2, b.value
FROM g440_a a FULL OUTER JOIN g440_b b ON a.key1 <=> b.key1 AND a.key2 <=> b.key2
