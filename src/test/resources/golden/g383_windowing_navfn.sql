-- windowing_navfn.q: lead/lag with and without explicit offset+default,
-- first_value on a DESC order, last_value over the running frame
SELECT s_suppkey,
  lead(s_name) over (partition by s_nationkey order by s_acctbal, s_suppkey) as nxt,
  lag(s_acctbal) over (partition by s_nationkey order by s_name, s_suppkey) as prv,
  lead(s_acctbal, 2, 0.0) over (partition by s_nationkey order by s_suppkey) as l2,
  lag(s_name, 1, 'none') over (partition by s_nationkey order by s_suppkey) as p1,
  first_value(s_name) over (partition by s_nationkey order by s_acctbal desc, s_suppkey) as topname,
  last_value(s_acctbal) over (partition by s_nationkey order by s_suppkey) as runlast
FROM supplier
