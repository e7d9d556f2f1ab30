-- udf battery (aggregate aliases over a real table): clientpositive/
-- udf_max.q, udf_min.q, udf_sum.q, udf_avg.q, udf_count.q, udf_std.q,
-- udf_stddev.q, udf_stddev_pop.q, udf_stddev_samp.q, udf_variance.q,
-- udf_var_pop.q, udf_var_samp.q, udf_percentile.q — Hive's std/stddev/
-- variance are POPULATION forms (std = stddev = stddev_pop,
-- variance = var_pop), pinned against the sample forms.
SELECT
  count(*) AS cnt, count(DISTINCT n_regionkey) AS cntd,
  max(n_nationkey) AS mx, min(n_nationkey) AS mn,
  sum(n_nationkey) AS sm, round(avg(n_nationkey), 6) AS av,
  round(std(n_nationkey), 6) AS sd1,
  round(stddev(n_nationkey), 6) AS sd2,
  round(stddev_pop(n_nationkey), 6) AS sd3,
  round(stddev_samp(n_nationkey), 6) AS sd4,
  round(variance(n_nationkey), 6) AS vr1,
  round(var_pop(n_nationkey), 6) AS vr2,
  round(var_samp(n_nationkey), 6) AS vr3,
  percentile(n_nationkey, 0.5) AS pc1,
  cast(percentile(n_nationkey, array(0.25, 0.75)) AS string) AS pc2
FROM nation
