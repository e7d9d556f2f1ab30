-- vectorization_0.q: min/max/count/count(*)/sum + the full variance/std
-- battery over a TINYINT column (here l_linenumber cast down; Hive's
-- variance/std/stddev are POPULATION aggregates — FunctionRegistry.java
-- :348-354 — which Engine.install re-points).
SELECT MIN(t) AS c_min, MAX(t) AS c_max, COUNT(t) AS c_cnt, COUNT(*) AS c_all,
       SUM(t) AS c_sum,
       ROUND(AVG(t) * 1000000) / 1000000 AS c_avg,
       ROUND(variance(t) * 1000000) / 1000000 AS c_varp,
       ROUND(var_samp(t) * 1000000) / 1000000 AS c_vars,
       ROUND(std(t) * 1000000) / 1000000 AS c_std,
       ROUND(stddev_samp(t) * 1000000) / 1000000 AS c_stds
FROM (SELECT CAST(l_linenumber AS TINYINT) AS t FROM lineitem) v
