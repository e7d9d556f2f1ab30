-- skewjoinopt7.q: three-way join where TWO tables are declared skewed
-- (different values) and the third is not — the skew split must not
-- change the multiset.
DROP TABLE IF EXISTS g783_t1;
DROP TABLE IF EXISTS g783_t2;
DROP TABLE IF EXISTS g783_t3;
CREATE TABLE g783_t1 (key STRING, val STRING) SKEWED BY (key) ON (('2'), ('8'));
CREATE TABLE g783_t2 (key STRING, val STRING) SKEWED BY (key) ON (('3'), ('8'));
CREATE TABLE g783_t3 (key STRING, val STRING);
INSERT INTO g783_t1 VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT INTO g783_t2 VALUES ('2','22'),('3','13'),('8','18'),('8','38');
INSERT INTO g783_t3 VALUES ('2','12'),('4','14'),('8','18');
SELECT a.key, a.val, b.key AS bk, b.val AS bv, c.key AS ck, c.val AS cv
FROM g783_t1 a JOIN g783_t2 b ON a.key = b.key JOIN g783_t3 c ON a.key = c.key
ORDER BY a.key, b.key, c.key, a.val, b.val, c.val
