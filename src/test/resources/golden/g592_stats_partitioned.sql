-- stats0.q partitioned half + stats_partscan_1.q: per-partition ANALYZE
-- and counts grouped by the partition column after a dynamic insert.
DROP TABLE IF EXISTS g592_t;
CREATE TABLE g592_t (key INT, value STRING) USING parquet PARTITIONED BY (ds STRING);
INSERT OVERWRITE TABLE g592_t PARTITION (ds) SELECT n_nationkey, n_name, CAST(n_regionkey AS STRING) FROM nation;
ANALYZE TABLE g592_t PARTITION (ds) COMPUTE STATISTICS;
SELECT ds, COUNT(*) AS n, MIN(key) AS min_k FROM g592_t GROUP BY ds
