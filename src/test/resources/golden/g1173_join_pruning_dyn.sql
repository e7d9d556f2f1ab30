-- reference: ql/src/test/queries/clientpositive/
-- dynamic_partition_pruning.q (+ dynamic_partition_pruning_2.q,
-- dynpart_sort_optimization.q shapes) — join-driven partition pruning:
-- a partitioned fact joined to a filtered dim must count only the
-- partitions the dim filter admits, with and without the filter.
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1173_fact;
CREATE TABLE g1173_fact (key INT)
  PARTITIONED BY (r STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1173_fact PARTITION (r)
  SELECT CAST(n_nationkey AS INT), concat('r', n_regionkey) FROM nation;
SELECT
  (SELECT count(*) FROM g1173_fact f
   JOIN region d ON f.r = concat('r', d.r_regionkey)
   WHERE d.r_name = 'REGION_2') AS pruned,
  (SELECT count(*) FROM g1173_fact f
   JOIN region d ON f.r = concat('r', d.r_regionkey)) AS all_matched,
  (SELECT count(DISTINCT r) FROM g1173_fact) AS nparts
