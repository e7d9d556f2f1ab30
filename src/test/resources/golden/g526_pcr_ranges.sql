-- pcr.q (partition condition remover): range/OR/AND mixes over partition
-- and data columns — a pruned-to-subset range, an unprunable OR, mixed
-- AND/OR needing a residual filter, a partition-only OR (condition fully
-- removed after pruning), an always-true disjunction (full scan, filter
-- dropped), and per-partition key ORs. Seven tagged variants.
DROP TABLE IF EXISTS g526_t1;
CREATE TABLE g526_t1 (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g526_t1 PARTITION (ds='2000-04-08')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 10;
INSERT INTO g526_t1 PARTITION (ds='2000-04-09')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 10;
INSERT INTO g526_t1 PARTITION (ds='2000-04-10')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 10;
SELECT 'range_and_key' AS v, key, value, ds FROM g526_t1
  WHERE ds <= '2000-04-09' AND key < 5
UNION ALL
SELECT 'or_unprunable', key, value, ds FROM g526_t1
  WHERE ds <= '2000-04-09' OR key < 5
UNION ALL
SELECT 'mixed_and_or', key, value, ds FROM g526_t1
  WHERE (ds < '2000-04-09' AND key < 5) OR (ds > '2000-04-09' AND value = 'val_5')
UNION ALL
SELECT 'cnf_mix', key, value, ds FROM g526_t1
  WHERE (ds < '2000-04-10' OR key < 5) AND (ds > '2000-04-08' OR value = 'val_5')
UNION ALL
SELECT 'partition_only_or', key, value, ds FROM g526_t1
  WHERE ds = '2000-04-08' OR ds = '2000-04-09'
UNION ALL
SELECT 'always_true', key, value, ds FROM g526_t1
  WHERE ds >= '2000-04-08' OR ds < '2000-04-10'
UNION ALL
SELECT 'per_partition_keys', key, value, ds FROM g526_t1
  WHERE (ds = '2000-04-08' AND key = 1) OR (ds = '2000-04-09' AND key = 2)
