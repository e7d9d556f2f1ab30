-- reference: ql/src/test/queries/clientpositive/sort_merge_join_desc_1.q
-- + sort_merge_join_desc_2.q — both sides bucketed AND sorted in the
-- same DESCENDING order on the join key; the sort-merge mapjoin keeps
-- the count correct across the desc-sorted bucket files.
DROP TABLE IF EXISTS g1052_desc1;
DROP TABLE IF EXISTS g1052_desc2;
CREATE TABLE g1052_desc1 (key STRING, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key DESC) INTO 1 BUCKETS;
CREATE TABLE g1052_desc2 (key STRING, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key DESC) INTO 1 BUCKETS;
INSERT OVERWRITE TABLE g1052_desc1 SELECT cast(n_nationkey AS STRING), n_name FROM nation;
INSERT OVERWRITE TABLE g1052_desc2 SELECT cast(n_nationkey AS STRING), n_name FROM nation;
SELECT /*+ MAPJOIN(b) */ count(*) AS cnt
FROM g1052_desc1 a JOIN g1052_desc2 b ON a.key = b.key WHERE a.key < '3';
