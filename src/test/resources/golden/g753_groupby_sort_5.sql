-- groupby_sort_5.q: same group-by against two bucketing layouts —
-- CLUSTERED BY (val) then re-created CLUSTERED BY (val, key), both
-- SORTED BY (key, val); results must be layout-independent.
DROP TABLE IF EXISTS g753_t1;
DROP TABLE IF EXISTS g753_o1;
CREATE TABLE g753_t1 (key STRING, val STRING)
  CLUSTERED BY (val) SORTED BY (key, val) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g753_t1 VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
CREATE TABLE g753_o1 (key STRING, val STRING, cnt INT);
INSERT OVERWRITE TABLE g753_o1 SELECT key, val, count(1) FROM g753_t1 GROUP BY key, val;
DROP TABLE g753_t1;
CREATE TABLE g753_t1 (key STRING, val STRING)
  CLUSTERED BY (val, key) SORTED BY (key, val) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g753_t1 VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g753_o1 SELECT key, val, count(1) FROM g753_t1 GROUP BY key, val;
SELECT key, val, cnt FROM g753_o1
