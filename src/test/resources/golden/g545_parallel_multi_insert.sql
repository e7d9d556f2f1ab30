-- parallel.q: multi-insert fed by an ALREADY-GROUPED subquery alias, each
-- branch re-grouping on the alias-qualified keys (s.key, s.value) — the
-- shared subquery is evaluated once and both destinations must agree.
DROP TABLE IF EXISTS g545_src;
DROP TABLE IF EXISTS g545_a;
DROP TABLE IF EXISTS g545_b;
CREATE TABLE g545_src USING parquet AS
  SELECT CAST(n_nationkey % 4 AS STRING) AS key, concat('val_', n_regionkey) AS value
  FROM nation;
CREATE TABLE g545_a (key STRING, value STRING) USING parquet;
CREATE TABLE g545_b (key STRING, value STRING) USING parquet;
FROM (SELECT key, value FROM g545_src GROUP BY key, value) s
INSERT OVERWRITE TABLE g545_a SELECT s.key, s.value GROUP BY s.key, s.value
INSERT OVERWRITE TABLE g545_b SELECT s.key, s.value GROUP BY s.key, s.value;
SELECT 'a' AS v, key, value FROM g545_a
UNION ALL
SELECT 'b', key, value FROM g545_b
