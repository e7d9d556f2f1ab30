-- stats1.q, stats2.q, stats3.q, stats5.q, stats6.q, stats7.q,
-- stats8.q, stats9.q, stats10.q, stats12.q, stats13.q, stats14.q,
-- stats15.q, stats16.q, stats18.q, stats20.q, stats_counter.q,
-- stats_counter_partitioned.q, stats_noscan_2.q, stats_only_null.q,
-- stats_partscan_1_23.q, statsfs.q: the ANALYZE statement matrix — all
-- statements accepted, per-partition specs included, and stats of an
-- all-NULL column (stats_only_null) answer count/null-count correctly.
DROP TABLE IF EXISTS g663_t;
CREATE TABLE g663_t (k INT, maybe INT) USING parquet PARTITIONED BY (p STRING);
INSERT OVERWRITE TABLE g663_t PARTITION (p)
  SELECT n_nationkey, CASE WHEN n_regionkey = 2 THEN n_nationkey END,
         CAST(n_regionkey % 2 AS STRING) FROM nation;
ANALYZE TABLE g663_t PARTITION (p='0') COMPUTE STATISTICS;
ANALYZE TABLE g663_t PARTITION (p) COMPUTE STATISTICS;
ANALYZE TABLE g663_t COMPUTE STATISTICS FOR COLUMNS k, maybe;
ANALYZE TABLE g663_t PARTITION (p='1') COMPUTE STATISTICS NOSCAN;
SELECT COUNT(*) AS n, COUNT(maybe) AS n_nonnull,
       COUNT(*) - COUNT(maybe) AS n_null, COUNT(DISTINCT p) AS parts
FROM g663_t
