-- sort_merge_join_desc_1.q: bucketed tables declared SORTED BY (key
-- DESC) — the engine normalizes the direction (within-bucket file
-- order has no read-path semantics Spark consumes) and the SMB-shaped
-- mapjoin still counts exactly; a.key < 10 compares string-vs-int via
-- double (Hive coercion).
DROP TABLE IF EXISTS g1011_d1;
DROP TABLE IF EXISTS g1011_d2;
CREATE TABLE g1011_d1 (key STRING, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key DESC) INTO 1 BUCKETS;
CREATE TABLE g1011_d2 (key STRING, value STRING) USING parquet
  CLUSTERED BY (key) SORTED BY (key DESC) INTO 1 BUCKETS;
INSERT OVERWRITE TABLE g1011_d1
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
INSERT OVERWRITE TABLE g1011_d2
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
SELECT /*+ MAPJOIN(b) */ count(*) AS c
FROM g1011_d1 a JOIN g1011_d2 b ON a.key = b.key WHERE a.key < 10
