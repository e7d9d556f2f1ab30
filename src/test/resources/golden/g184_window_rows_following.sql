-- windowing_windowspec.q: ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING
SELECT s_suppkey,
  round(avg(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) * 100) / 100 AS a
FROM supplier
