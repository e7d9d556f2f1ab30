-- vectorization_0.q shape: min/max/count/sum/avg/variance family over a
-- numeric column with a filter mix — Hive's vectorized-exec battery; on
-- Spark this pins the whole-stage-codegen aggregate path.
SELECT
  min(l_quantity) AS mn,
  max(l_quantity) AS mx,
  count(l_quantity) AS cnt,
  count(*) AS cstar,
  round(sum(l_quantity) * 100) / 100 AS sm,
  round(avg(l_quantity) * 100) / 100 AS av,
  round(variance(l_quantity) * 100) / 100 AS var_pop_v,
  round(var_samp(l_quantity) * 100) / 100 AS var_samp_v,
  round(stddev_pop(l_quantity) * 100) / 100 AS std_pop_v,
  round(stddev_samp(l_quantity) * 100) / 100 AS std_samp_v
FROM lineitem
WHERE l_orderkey % 2 = 0 AND l_quantity > 10
