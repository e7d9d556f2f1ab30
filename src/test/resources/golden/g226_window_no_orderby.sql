-- window over a partition with NO order: whole-partition frame for aggregates
SELECT s_nationkey, s_suppkey,
  round(sum(s_acctbal) OVER (PARTITION BY s_nationkey) * 100) / 100 AS part_total,
  count(*) OVER (PARTITION BY s_nationkey) AS part_n
FROM supplier
