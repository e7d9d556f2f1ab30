-- groupby_sort_2.q: group by the SORT column of a bucketed-sorted table
-- (the reference's map-side sorted-groupby path); INSERT OVERWRITE twice
-- to pin overwrite idempotence, then read back.
DROP TABLE IF EXISTS g750_t1;
DROP TABLE IF EXISTS g750_out;
CREATE TABLE g750_t1 (key STRING, val STRING)
  CLUSTERED BY (key) SORTED BY (val) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g750_t1 VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g750_t1 SELECT key, val FROM g750_t1;
CREATE TABLE g750_out (val STRING, cnt INT) STORED AS TEXTFILE;
INSERT OVERWRITE TABLE g750_out SELECT val, count(1) FROM g750_t1 GROUP BY val;
INSERT OVERWRITE TABLE g750_out SELECT val, count(1) FROM g750_t1 GROUP BY val;
SELECT val, cnt FROM g750_out
