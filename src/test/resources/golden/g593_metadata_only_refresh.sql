-- metadata_only_queries.q: the stats answer tracks re-ANALYZE after new
-- data lands — never a stale snapshot once stats are recomputed.
DROP TABLE IF EXISTS g593_t;
CREATE TABLE g593_t (k INT) USING parquet;
INSERT INTO g593_t SELECT n_nationkey FROM nation;
ANALYZE TABLE g593_t COMPUTE STATISTICS;
SET spark.graft.statsAnswer.enabled=true;
DROP TABLE IF EXISTS g593_s1;
CREATE TABLE g593_s1 USING parquet AS SELECT COUNT(*) AS n1 FROM g593_t;
INSERT INTO g593_t VALUES (1000), (1001);
ANALYZE TABLE g593_t COMPUTE STATISTICS;
SELECT (SELECT n1 FROM g593_s1) AS before_cnt, COUNT(*) AS after_cnt FROM g593_t
