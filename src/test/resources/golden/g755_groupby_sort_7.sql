-- groupby_sort_7.q: bucketed-sorted AND partitioned — group by the sort
-- prefix within one partition, double INSERT OVERWRITE, read back.
DROP TABLE IF EXISTS g755_t1;
DROP TABLE IF EXISTS g755_out;
CREATE TABLE g755_t1 (key STRING, val STRING) PARTITIONED BY (ds STRING)
  CLUSTERED BY (val) SORTED BY (key, val) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g755_t1 PARTITION (ds='1') VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g755_t1 PARTITION (ds='1') SELECT key, val FROM g755_t1 WHERE ds = '1';
CREATE TABLE g755_out (key STRING, val STRING, cnt INT);
INSERT OVERWRITE TABLE g755_out SELECT key, val, count(1) FROM g755_t1 WHERE ds = '1' GROUP BY key, val;
INSERT OVERWRITE TABLE g755_out SELECT key, val, count(1) FROM g755_t1 WHERE ds = '1' GROUP BY key, val;
SELECT key, val, cnt FROM g755_out
