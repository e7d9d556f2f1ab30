SELECT o_orderkey,
  lag(o_totalprice, 2, -1.0) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS lag2,
  lead(o_totalprice, 1, 0.0) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS lead1,
  nth_value(o_totalprice, 2) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS nth2
FROM orders WHERE o_orderkey <= 100
