-- skewjoinopt1.q: tables declared SKEWED BY on the join key, inner and
-- outer joins plus a trailing aggregation. The SKEWED BY metadata is
-- accepted DDL; runtime skew handling is AQE's job (set statements are
-- Hive's toggles, accepted as session conf).
set hive.optimize.skewjoin.compiletime = true;
DROP TABLE IF EXISTS g430_t1;
DROP TABLE IF EXISTS g430_t2;
CREATE TABLE g430_t1 (key STRING, val STRING) SKEWED BY (key) ON ((2)) STORED AS TEXTFILE;
CREATE TABLE g430_t2 (key STRING, val STRING) SKEWED BY (key) ON ((3)) STORED AS TEXTFILE;
INSERT INTO g430_t1 VALUES ('1','11'), ('2','12'), ('2','22'), ('3','13'), ('8','18');
INSERT INTO g430_t2 VALUES ('2','32'), ('3','33'), ('3','43'), ('4','34'), ('8','38');
SELECT 'inner' AS tag, a.key AS ak, a.val AS av, b.key AS bk, b.val AS bv
FROM g430_t1 a JOIN g430_t2 b ON a.key = b.key
UNION ALL
SELECT 'roj', a.key, a.val, b.key, b.val
FROM g430_t1 a RIGHT OUTER JOIN g430_t2 b ON a.key = b.key
UNION ALL
SELECT 'agg', cast(count(1) AS STRING), NULL, NULL, NULL
FROM g430_t1 a JOIN g430_t2 b ON a.key = b.key
