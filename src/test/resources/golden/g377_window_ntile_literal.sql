-- The literal empty-PARTITION BY distribution-function window: Hive's
-- PTFOperator form (windowing.q). Spark plans this as ONE partition —
-- correct but a funnel at scale, so the oracled gate (q23) runs the
-- range-partitioned GlobalRank path instead; this golden pins the plain
-- SQL-text semantics at fixture scale.
SELECT s_suppkey,
  ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile,
  round(percent_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) * 1000000) / 1000000 AS pr,
  round(cume_dist() OVER (ORDER BY s_acctbal DESC, s_suppkey) * 1000000) / 1000000 AS cd
FROM supplier
