-- sort_merge_join_desc_1.q: bucketed tables SORTED BY key DESC still
-- join correctly under the mapjoin hint (sort direction must not change
-- the result).
DROP TABLE IF EXISTS g826_d1;
DROP TABLE IF EXISTS g826_d2;
CREATE TABLE g826_d1 (key INT, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key DESC) INTO 1 BUCKETS;
CREATE TABLE g826_d2 (key INT, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key DESC) INTO 1 BUCKETS;
INSERT OVERWRITE TABLE g826_d1 SELECT n_nationkey, n_name FROM nation;
INSERT OVERWRITE TABLE g826_d2 SELECT n_nationkey, n_name FROM nation;
SELECT /*+ MAPJOIN(b) */ count(*) AS n
FROM g826_d1 a JOIN g826_d2 b ON a.key = b.key WHERE a.key < 10
