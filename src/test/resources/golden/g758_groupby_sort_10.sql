-- groupby_sort_10.q: SELECT DISTINCT over a partitioned bucketed-sorted
-- table, before and after a second partition lands (same distinct set).
DROP TABLE IF EXISTS g758_t1;
CREATE TABLE g758_t1 (key STRING, val STRING) PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
INSERT OVERWRITE TABLE g758_t1 PARTITION (ds='1')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey = 0 OR n_nationkey = 11;
INSERT OVERWRITE TABLE g758_t1 PARTITION (ds='2')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation WHERE n_nationkey = 0 OR n_nationkey = 11;
SELECT DISTINCT key FROM g758_t1
