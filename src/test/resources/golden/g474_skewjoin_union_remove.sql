-- skewjoin_union_remove_1.q: skewed-table joins under a UNION ALL whose
-- branches the union-remove optimization may write independently.
set hive.optimize.skewjoin.compiletime = true;
set hive.optimize.union.remove = true;
DROP TABLE IF EXISTS g474_t1;
DROP TABLE IF EXISTS g474_t2;
CREATE TABLE g474_t1 (key STRING, val STRING) SKEWED BY (key) ON ((2)) STORED AS TEXTFILE;
CREATE TABLE g474_t2 (key STRING, val STRING) SKEWED BY (key) ON ((3)) STORED AS TEXTFILE;
INSERT INTO g474_t1 VALUES ('1','11'), ('2','12'), ('2','22'), ('3','13'), ('8','18');
INSERT INTO g474_t2 VALUES ('2','32'), ('3','33'), ('4','34'), ('8','38');
SELECT u.key AS k, u.val AS v
FROM (
  SELECT a.key, a.val FROM g474_t1 a JOIN g474_t2 b ON a.key = b.key
  UNION ALL
  SELECT a.key, a.val FROM g474_t1 a JOIN g474_t2 b ON a.key = b.key
) u
