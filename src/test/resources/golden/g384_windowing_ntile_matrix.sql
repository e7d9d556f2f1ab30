-- windowing_ntile.q: ntile across bucket counts that do and don't divide
-- the partition evenly, plus ntile over the whole input
SELECT o_orderkey,
  ntile(3) over (partition by o_orderstatus order by o_totalprice, o_orderkey) as n3,
  ntile(5) over (partition by o_orderstatus order by o_orderkey) as n5,
  ntile(7) over (order by o_totalprice, o_orderkey) as n7
FROM orders WHERE o_orderkey <= 300
