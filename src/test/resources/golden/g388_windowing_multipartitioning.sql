-- windowing_multipartitioning.q: several DIFFERENT partition specs in one
-- select + two named specs — each distinct spec is its own shuffle
SELECT s_suppkey,
  rank() over w1 as r1,
  rank() over w2 as r2,
  round(sum(s_acctbal) over (partition by s_nationkey) * 100) / 100 as nat_sum,
  row_number() over (order by s_acctbal desc, s_suppkey) as global_rn
FROM supplier
window w1 as (partition by s_nationkey order by s_acctbal, s_suppkey),
       w2 as (partition by substr(s_name, 18, 1) order by s_name)
