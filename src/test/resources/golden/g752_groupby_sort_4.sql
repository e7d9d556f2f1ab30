-- groupby_sort_4.q: bucket on (key,val) but sort on (key) only — group
-- by key and by (key,val); neither matches the full bucketing spec.
DROP TABLE IF EXISTS g752_t1;
DROP TABLE IF EXISTS g752_o1;
DROP TABLE IF EXISTS g752_o2;
CREATE TABLE g752_t1 (key STRING, val STRING)
  CLUSTERED BY (key, val) SORTED BY (key) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g752_t1 VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g752_t1 SELECT key, val FROM g752_t1;
CREATE TABLE g752_o1 (key STRING, cnt INT);
INSERT OVERWRITE TABLE g752_o1 SELECT key, count(1) FROM g752_t1 GROUP BY key;
CREATE TABLE g752_o2 (key STRING, val STRING, cnt INT);
INSERT OVERWRITE TABLE g752_o2 SELECT key, val, count(1) FROM g752_t1 GROUP BY key, val;
SELECT 'o1' AS src, key, NULL AS val, cnt FROM g752_o1
UNION ALL
SELECT 'o2' AS src, key, val, cnt FROM g752_o2
