-- union_remove_10.q, union_remove_11.q, union_remove_15.q,
-- union_remove_16.q, union_remove_18.q, union_remove_20.q,
-- union_remove_21.q, union_remove_25.q:
-- union-removal with DYNAMIC PARTITIONS — the union lands per-partition;
-- removal must keep partition routing intact.
DROP TABLE IF EXISTS g640_d;
CREATE TABLE g640_d (k INT) USING parquet PARTITIONED BY (p STRING);
INSERT OVERWRITE TABLE g640_d PARTITION (p)
SELECT n_nationkey, CAST(n_regionkey AS STRING) FROM nation WHERE n_regionkey < 2
UNION ALL
SELECT n_nationkey + 100, CAST(n_regionkey AS STRING) FROM nation WHERE n_regionkey >= 3;
SELECT p, COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx FROM g640_d GROUP BY p
