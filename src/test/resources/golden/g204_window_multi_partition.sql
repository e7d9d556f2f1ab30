-- windowing.q: several window fns with different partitions in one SELECT
SELECT s_suppkey,
  rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS r1,
  round(sum(s_acctbal) OVER (PARTITION BY s_nationkey % 5 ORDER BY s_suppkey ROWS UNBOUNDED PRECEDING) * 100) / 100 AS s2,
  lead(s_suppkey, 2) OVER (ORDER BY s_suppkey) AS ld
FROM supplier
