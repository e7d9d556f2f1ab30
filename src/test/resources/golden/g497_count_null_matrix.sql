-- count.q: count(*) vs count(1) vs count(col) vs count(DISTINCT col)
-- over NULL-bearing data, grouped and global.
DROP TABLE IF EXISTS g497_t;
CREATE TABLE g497_t (a INT, b INT, c INT);
INSERT INTO g497_t VALUES (1,NULL,3), (1,2,NULL), (1,2,3), (2,NULL,NULL), (2,2,3), (NULL,2,3);
SELECT 'global' AS tag, NULL AS grp,
       cast(count(*) AS STRING) AS cstar, cast(count(1) AS STRING) AS c1,
       cast(count(b) AS STRING) AS cb, cast(count(DISTINCT b) AS STRING) AS cdb,
       cast(count(DISTINCT b, c) AS STRING) AS cdbc
FROM g497_t
UNION ALL
SELECT 'grouped', cast(a AS STRING), cast(count(*) AS STRING), cast(count(1) AS STRING),
       cast(count(b) AS STRING), cast(count(DISTINCT b) AS STRING),
       cast(count(DISTINCT b, c) AS STRING)
FROM g497_t GROUP BY a
