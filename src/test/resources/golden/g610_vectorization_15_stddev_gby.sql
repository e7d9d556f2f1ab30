-- vectorization_15.q: the variance family GROUPED (per-key population
-- semantics), plus count distinct in the same aggregate.
SELECT l_linestatus,
  ROUND(stddev(l_quantity) * 1000000) / 1000000 AS std_q,
  ROUND(var_samp(l_discount) * 1000000) / 1000000 AS vars_d,
  COUNT(DISTINCT l_returnflag) AS n_flags,
  ROUND(AVG(l_extendedprice) * 100) / 100 AS avg_p
FROM lineitem GROUP BY l_linestatus
