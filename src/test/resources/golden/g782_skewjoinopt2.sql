-- skewjoinopt2.q: joins between tables DECLARED SKEWED BY on different
-- values, on a TWO-column key — inner, left outer, and the re-grouped
-- aggregate must all match the plain-join semantics.
DROP TABLE IF EXISTS g782_t1;
DROP TABLE IF EXISTS g782_t2;
CREATE TABLE g782_t1 (key STRING, val STRING) SKEWED BY (key) ON (('2'), ('7'));
CREATE TABLE g782_t2 (key STRING, val STRING) SKEWED BY (key) ON (('3'), ('8'));
INSERT INTO g782_t1 VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT INTO g782_t2 VALUES ('2','12'),('3','13'),('4','14'),('8','18'),('8','28');
SELECT 'inner' AS tag, a.key, a.val, b.key AS bk, b.val AS bv
FROM g782_t1 a JOIN g782_t2 b ON a.key = b.key AND a.val = b.val
UNION ALL
SELECT 'louter', a.key, a.val, b.key, b.val
FROM g782_t1 a LEFT OUTER JOIN g782_t2 b ON a.key = b.key AND a.val = b.val
UNION ALL
SELECT 'agg', a.key, CAST(count(1) AS STRING), NULL, NULL
FROM g782_t1 a JOIN g782_t2 b ON a.key = b.key AND a.val = b.val GROUP BY a.key
