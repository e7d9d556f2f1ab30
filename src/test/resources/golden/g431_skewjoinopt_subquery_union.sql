-- skewjoinopt9.q shape: a skewed-table join consumed through a UNION ALL
-- subquery and through a group-by subquery — the skew rewrite must not
-- change either result.
set hive.optimize.skewjoin.compiletime = true;
DROP TABLE IF EXISTS g431_t1;
DROP TABLE IF EXISTS g431_t2;
CREATE TABLE g431_t1 (key STRING, val STRING) SKEWED BY (key) ON ((2)) STORED AS TEXTFILE;
CREATE TABLE g431_t2 (key STRING, val STRING);
INSERT INTO g431_t1 VALUES ('1','11'), ('2','12'), ('2','22'), ('3','13'), ('8','18');
INSERT INTO g431_t2 VALUES ('2','32'), ('3','33'), ('3','43'), ('4','34'), ('8','38');
SELECT 'union' AS tag, u.key AS k, u.val AS v, b.val AS bv
FROM (
  SELECT key, val FROM g431_t1
  UNION ALL
  SELECT key, val FROM g431_t1
) u JOIN g431_t2 b ON u.key = b.key
UNION ALL
SELECT 'gby', g.key, cast(g.cnt AS STRING), b.val
FROM (SELECT key, count(1) AS cnt FROM g431_t1 GROUP BY key) g
JOIN g431_t2 b ON g.key = b.key
