-- windowing_udaf.q: min/max/avg/sum as windowing functions, running and
-- whole-partition frames side by side
SELECT o_orderstatus, o_orderkey,
  round(min(o_totalprice) over (partition by o_orderstatus order by o_orderkey) * 100) / 100 as mn,
  round(max(o_totalprice) over (partition by o_orderstatus order by o_orderkey) * 100) / 100 as mx,
  round(avg(o_totalprice) over (partition by o_orderstatus order by o_orderkey) * 100) / 100 as av,
  round(sum(o_totalprice) over (partition by o_orderstatus) * 100) / 100 as tot
FROM orders WHERE o_orderkey <= 600
