-- windowing_rank.q PTFPPD: rank computed below a join, filtered above it —
-- the predicate must not push through the rank (it would change results)
SELECT n_name, s_name, rnk FROM (
  SELECT n_name, s_name,
    rank() over (partition by n_name order by s_acctbal desc, s_suppkey) as rnk
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
) ranked WHERE rnk <= 2
