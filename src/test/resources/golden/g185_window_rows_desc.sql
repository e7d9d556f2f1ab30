-- windowing_windowspec.q: DESC order with a symmetric ROWS frame
SELECT s_suppkey,
  round(avg(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_name, s_acctbal DESC ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) * 100) / 100 AS a
FROM supplier
