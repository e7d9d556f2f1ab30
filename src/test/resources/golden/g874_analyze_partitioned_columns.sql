-- analyze_tbl_part.q: ANALYZE ... PARTITION (id) COMPUTE STATISTICS FOR
-- COLUMNS over a dynamic full-partition spec, then reading the column
-- stats back (min/max/null-count/distinct via DESCRIBE EXTENDED
-- surfaces engine-side; here the golden pins the count(*) answered
-- from stats and the re-scan agreeing after ANALYZE).
DROP TABLE IF EXISTS g874_sp;
CREATE TABLE g874_sp (key STRING, value STRING)
  USING parquet PARTITIONED BY (partitionId INT);
INSERT OVERWRITE TABLE g874_sp PARTITION (partitionId=1)
  SELECT n_name, CAST(n_regionkey AS STRING) FROM nation;
INSERT OVERWRITE TABLE g874_sp PARTITION (partitionId=2)
  SELECT n_name, CAST(n_nationkey AS STRING) FROM nation;
ANALYZE TABLE g874_sp PARTITION (partitionId) COMPUTE STATISTICS;
ANALYZE TABLE g874_sp PARTITION (partitionId) COMPUTE STATISTICS FOR COLUMNS key;
SELECT count(*) AS n, count(DISTINCT key) AS dk FROM g874_sp
