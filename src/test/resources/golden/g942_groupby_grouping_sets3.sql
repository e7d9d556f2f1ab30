-- groupby_grouping_sets3.q: avg + count(*) WITH CUBE over a table built
-- from TWO loads with overlapping (a,b) values — partial aggregate
-- state must merge correctly across input splits (the stem's
-- BucketizedHiveInputFormat concern; here: two INSERTs = two files).
DROP TABLE IF EXISTS g942_t1;
CREATE TABLE g942_t1 (a STRING, b STRING, c STRING) USING parquet;
INSERT INTO g942_t1
  SELECT CAST(n_regionkey AS STRING), CAST(n_nationkey % 2 AS STRING),
         CAST(n_nationkey AS STRING)
  FROM nation WHERE n_nationkey < 10;
INSERT INTO g942_t1
  SELECT CAST(n_regionkey AS STRING), CAST(n_nationkey % 2 AS STRING),
         CAST(n_nationkey + 2 AS STRING)
  FROM nation WHERE n_nationkey < 6;
SELECT a, b, round(avg(c), 6) AS avg_c, count(*) AS cnt
FROM g942_t1 GROUP BY a, b WITH CUBE
