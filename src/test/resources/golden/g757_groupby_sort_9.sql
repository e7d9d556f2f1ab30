-- groupby_sort_9.q: copy partition ds=1 into ds=2, then group by key
-- across BOTH partitions — every count doubles.
DROP TABLE IF EXISTS g757_t1;
CREATE TABLE g757_t1 (key STRING, val STRING) PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g757_t1 PARTITION (ds='1') VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g757_t1 PARTITION (ds='2') SELECT key, val FROM g757_t1 WHERE ds = '1';
SELECT key, count(1) AS cnt FROM g757_t1 GROUP BY key
