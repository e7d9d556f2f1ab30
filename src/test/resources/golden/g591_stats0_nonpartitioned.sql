-- stats0.q: autogathered basic stats on a plain table — ANALYZE, then a
-- bare count(*) answered FROM THE CATALOG (StatsAnswerRule, the engine's
-- StatsOptimizer; hive.compute.query.using.stats) must equal the true
-- count, alongside a real-scan aggregate over the same data.
DROP TABLE IF EXISTS g591_t;
CREATE TABLE g591_t (key INT, value STRING) USING parquet;
INSERT OVERWRITE TABLE g591_t SELECT n_nationkey, n_name FROM nation;
ANALYZE TABLE g591_t COMPUTE STATISTICS;
SET spark.graft.statsAnswer.enabled=true;
SELECT (SELECT COUNT(*) FROM g591_t) AS stats_cnt,
       (SELECT COUNT(*) FROM g591_t WHERE key >= 0) AS scan_cnt,
       (SELECT MIN(key) FROM g591_t) AS true_min
