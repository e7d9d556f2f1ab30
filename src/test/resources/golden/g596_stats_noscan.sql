-- stats_noscan_1.q: ANALYZE ... NOSCAN gathers file-level stats without
-- reading rows; a later full ANALYZE upgrades them; answers unchanged.
DROP TABLE IF EXISTS g596_t;
CREATE TABLE g596_t (k INT, v STRING) USING parquet;
INSERT INTO g596_t SELECT r_regionkey, r_name FROM region;
ANALYZE TABLE g596_t COMPUTE STATISTICS NOSCAN;
SELECT COUNT(*) AS scan_cnt_after_noscan FROM g596_t;
ANALYZE TABLE g596_t COMPUTE STATISTICS;
SET spark.graft.statsAnswer.enabled=true;
SELECT COUNT(*) AS stats_cnt, (SELECT SUM(k) FROM g596_t) AS true_sum FROM g596_t
