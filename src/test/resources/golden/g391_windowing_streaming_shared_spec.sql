-- windowing_streaming.q shape: every window shares ONE spec (streamable in
-- Hive; one WindowExec in Spark) — rank + running sum + row_number together
SELECT c_mktsegment, c_custkey,
  rank() over w as r,
  row_number() over w as rn,
  round(sum(c_acctbal) over (partition by c_mktsegment order by c_custkey
    rows unbounded preceding) * 100) / 100 as s
FROM customer WHERE c_custkey <= 300
window w as (partition by c_mktsegment order by c_custkey)
