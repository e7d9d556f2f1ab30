-- stats_noscan_1.q: ANALYZE ... COMPUTE STATISTICS NOSCAN (file-level
-- stats only, no data read) then the full form; query results must be
-- unaffected either way.
DROP TABLE IF EXISTS g315_t;
CREATE TABLE g315_t USING parquet AS SELECT * FROM region;
ANALYZE TABLE g315_t COMPUTE STATISTICS NOSCAN;
ANALYZE TABLE g315_t COMPUTE STATISTICS;
SELECT count(*) AS n, max(r_name) AS mx FROM g315_t;
