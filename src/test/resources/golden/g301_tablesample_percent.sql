-- sample_percent: TABLESAMPLE (n PERCENT) — block-sampled in the
-- reference (CombineHiveInputFormat splits), row-Bernoulli in Spark.
-- Nondeterministic by spec either way, so the golden pins invariants
-- (bounds against the 25-row nation fixture), not the row set.
SELECT count(*) BETWEEN 0 AND 25 AS bounded,
       count(*) >= 0             AS nonneg
FROM nation TABLESAMPLE (50 PERCENT);
