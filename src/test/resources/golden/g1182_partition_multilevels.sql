-- reference: ql/src/test/queries/clientpositive/partition_multilevels.q
-- + partcols1.q — THREE partition levels with filters at each depth
-- and a partial-depth aggregate.
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1182_ml;
CREATE TABLE g1182_ml (key INT)
  PARTITIONED BY (level1 STRING, level2 STRING, level3 STRING)
  STORED AS PARQUET;
INSERT OVERWRITE TABLE g1182_ml PARTITION (level1, level2, level3)
  SELECT CAST(n_nationkey AS INT),
         concat('l1_', n_nationkey % 2),
         concat('l2_', n_regionkey % 2),
         concat('l3_', n_nationkey % 3)
  FROM nation;
SELECT
  (SELECT count(*) FROM g1182_ml WHERE level1 = 'l1_0') AS d1,
  (SELECT count(*) FROM g1182_ml WHERE level1 = 'l1_0' AND level2 = 'l2_1') AS d2,
  (SELECT count(*) FROM g1182_ml
   WHERE level1 = 'l1_1' AND level2 = 'l2_0' AND level3 = 'l3_2') AS d3,
  (SELECT count(DISTINCT level3) FROM g1182_ml) AS n3,
  (SELECT count(DISTINCT concat(level1, level2, level3)) FROM g1182_ml) AS leafs
