-- windowing_windowspec.q: RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
SELECT s_suppkey,
  round(sum(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) * 100) / 100 AS tail_sum
FROM supplier
