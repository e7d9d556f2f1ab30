-- pcr.q (join + multi-insert shapes): self-join with per-side partition
-- predicates in ON (same vs different partitions), then a FROM-first
-- multi-insert whose branches carry partition filters — the partition
-- condition must prune per-branch, not globally.
DROP TABLE IF EXISTS g527_t1;
DROP TABLE IF EXISTS g527_t2;
DROP TABLE IF EXISTS g527_t3;
CREATE TABLE g527_t1 (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g527_t1 PARTITION (ds='2000-04-08')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 6;
INSERT INTO g527_t1 PARTITION (ds='2000-04-09')
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 6;
CREATE TABLE g527_t2 (key INT, value STRING) USING parquet;
CREATE TABLE g527_t3 (key INT, value STRING) USING parquet;
FROM g527_t1
INSERT OVERWRITE TABLE g527_t2 SELECT key, value WHERE ds = '2000-04-08' AND key = 2
INSERT OVERWRITE TABLE g527_t3 SELECT key, value WHERE ds = '2000-04-08' AND key = 3;
SELECT 'join_same_part' AS v, t1.key AS k, t1.ds AS x1, t2.ds AS x2
FROM g527_t1 t1 JOIN g527_t1 t2
  ON t1.key = t2.key AND t1.ds = '2000-04-08' AND t2.ds = '2000-04-08'
UNION ALL
SELECT 'join_cross_part', t1.key, t1.ds, t2.ds
FROM g527_t1 t1 JOIN g527_t1 t2
  ON t1.key = t2.key AND t1.ds = '2000-04-08' AND t2.ds = '2000-04-09'
UNION ALL
SELECT 'mi_t2', key, CAST(NULL AS STRING), value FROM g527_t2
UNION ALL
SELECT 'mi_t3', key, CAST(NULL AS STRING), value FROM g527_t3
