-- stats_empty_partition.q / stats0.q edge: ANALYZE of an empty table
-- records rowCount 0 and the stats answer must be 0, not NULL.
DROP TABLE IF EXISTS g595_t;
CREATE TABLE g595_t (k INT) USING parquet;
ANALYZE TABLE g595_t COMPUTE STATISTICS;
SET spark.graft.statsAnswer.enabled=true;
SELECT COUNT(*) AS n FROM g595_t
