-- groupby_sort_skew_1.q: the groupby_sort_1 shape with
-- hive.groupby.skewindata=true — skew mode must not change results.
set hive.groupby.skewindata=true;
DROP TABLE IF EXISTS g760_t1;
DROP TABLE IF EXISTS g760_o1;
DROP TABLE IF EXISTS g760_o2;
CREATE TABLE g760_t1 (key STRING, val STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g760_t1 VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g760_t1 SELECT key, val FROM g760_t1;
CREATE TABLE g760_o1 (key INT, cnt INT);
INSERT OVERWRITE TABLE g760_o1 SELECT key, count(1) FROM g760_t1 GROUP BY key;
INSERT OVERWRITE TABLE g760_o1 SELECT key, count(1) FROM g760_t1 GROUP BY key;
CREATE TABLE g760_o2 (key1 INT, key2 STRING, cnt INT);
INSERT OVERWRITE TABLE g760_o2 SELECT key, val, count(1) FROM g760_t1 GROUP BY key, val;
SELECT 'o1' AS src, key, NULL AS k2, cnt FROM g760_o1
UNION ALL
SELECT 'o2' AS src, key1, key2, cnt FROM g760_o2;
set hive.groupby.skewindata=false
