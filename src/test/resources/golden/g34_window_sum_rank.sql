SELECT s_suppkey, s_nationkey,
  rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS r
FROM supplier
