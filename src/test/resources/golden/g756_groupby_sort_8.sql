-- groupby_sort_8.q: count(DISTINCT sort-column) over a bucketed-sorted
-- partitioned table — the reference asserts the distinct still spans
-- ALL buckets (5 distinct keys), not per-bucket partials.
DROP TABLE IF EXISTS g756_t1;
CREATE TABLE g756_t1 (key STRING, val STRING) PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS TEXTFILE;
INSERT INTO g756_t1 PARTITION (ds='1') VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g756_t1 PARTITION (ds='1') SELECT key, val FROM g756_t1 WHERE ds = '1';
SELECT count(DISTINCT key) AS dk FROM g756_t1
