-- windowing_windowspec.q: running sum, ROWS UNBOUNDED PRECEDING
SELECT s_nationkey, s_suppkey,
  round(sum(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey ROWS UNBOUNDED PRECEDING) * 100) / 100 AS run
FROM supplier
