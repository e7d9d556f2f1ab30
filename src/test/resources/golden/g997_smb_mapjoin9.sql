-- smb_mapjoin9.q: sort-merge-bucket MAPJOIN over PARTITIONED bucketed
-- tables — first against EMPTY partitions (HIVE-3205: zero rows, no
-- crash), then both sides filled and joined partition-to-partition in
-- both hint directions.
DROP TABLE IF EXISTS g997_b1;
DROP TABLE IF EXISTS g997_b2;
CREATE TABLE g997_b1 (key INT, value STRING) USING parquet
  PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
CREATE TABLE g997_b2 (key INT, value STRING) USING parquet
  PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS;
SELECT /*+ MAPJOIN(b) */ b.key AS k1, b.value, b.ds, a.key AS k2
FROM g997_b1 a JOIN g997_b2 b ON a.key = b.key
WHERE a.ds = '2010-10-15' AND b.ds = '2010-10-15' AND b.key IS NOT NULL;
INSERT OVERWRITE TABLE g997_b1 PARTITION (ds='2010-10-15')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
INSERT OVERWRITE TABLE g997_b2 PARTITION (ds='2010-10-15')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey % 2 = 0;
SELECT 'mj_b' AS probe, b.key AS k1, b.value, b.ds, a.key AS k2
FROM g997_b1 a JOIN g997_b2 b ON a.key = b.key
WHERE a.ds = '2010-10-15' AND b.ds = '2010-10-15' AND b.key IS NOT NULL
UNION ALL
SELECT /*+ MAPJOIN(a) */ 'mj_a' AS probe, b.key, b.value, b.ds, a.key
FROM g997_b1 a JOIN g997_b2 b ON a.key = b.key
WHERE a.ds = '2010-10-15' AND b.ds = '2010-10-15' AND b.key IS NOT NULL
