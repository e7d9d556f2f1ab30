-- reference: ql/src/test/queries/clientpositive/sort_merge_join_desc_2.q
-- + sort_merge_join_desc_3.q + sort_merge_join_desc_4.q +
-- sort_merge_join_desc_5.q + sort_merge_join_desc_6.q +
-- sort_merge_join_desc_7.q + sort_merge_join_desc_8.q — DESC-sorted
-- bucketed tables under the SMB confs: matching desc/desc layouts,
-- a two-column sort, and a filtered count (g1052 covers desc_1).
set hive.optimize.bucketmapjoin=true;
set hive.optimize.bucketmapjoin.sortedmerge=true;
DROP TABLE IF EXISTS g1147_d1;
DROP TABLE IF EXISTS g1147_d2;
CREATE TABLE g1147_d1 (key STRING, value STRING)
  CLUSTERED BY (key, value) SORTED BY (key DESC, value DESC) INTO 2 BUCKETS
  STORED AS PARQUET;
CREATE TABLE g1147_d2 (key STRING, value STRING)
  CLUSTERED BY (key, value) SORTED BY (key DESC, value DESC) INTO 2 BUCKETS
  STORED AS PARQUET;
INSERT OVERWRITE TABLE g1147_d1
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
INSERT OVERWRITE TABLE g1147_d2
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
SELECT
  (SELECT count(*) FROM g1147_d1 a JOIN g1147_d2 b
     ON a.key = b.key AND a.value = b.value WHERE a.key < '10') AS j2col,
  (SELECT /*+ MAPJOIN(b) */ count(*) FROM g1147_d1 a JOIN g1147_d2 b
     ON a.key = b.key WHERE a.key < '2') AS hinted
