-- groupby_sort_3.q: group by the full sort prefix (key,val) and by its
-- leading column of a CLUSTERED BY (key) SORTED BY (key,val) table.
DROP TABLE IF EXISTS g751_t1;
DROP TABLE IF EXISTS g751_o1;
DROP TABLE IF EXISTS g751_o2;
CREATE TABLE g751_t1 (key STRING, val STRING)
  CLUSTERED BY (key) SORTED BY (key, val) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g751_t1 VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g751_t1 SELECT key, val FROM g751_t1;
CREATE TABLE g751_o1 (key STRING, val STRING, cnt INT);
INSERT OVERWRITE TABLE g751_o1 SELECT key, val, count(1) FROM g751_t1 GROUP BY key, val;
INSERT OVERWRITE TABLE g751_o1 SELECT key, val, count(1) FROM g751_t1 GROUP BY key, val;
CREATE TABLE g751_o2 (key STRING, cnt INT);
INSERT OVERWRITE TABLE g751_o2 SELECT key, count(1) FROM g751_t1 GROUP BY key;
INSERT OVERWRITE TABLE g751_o2 SELECT key, count(1) FROM g751_t1 GROUP BY key;
SELECT 'o1' AS src, key, val, cnt FROM g751_o1
UNION ALL
SELECT 'o2' AS src, key, NULL, cnt FROM g751_o2
