SELECT o_orderstatus,
  sum(CAST(o_totalprice AS DECIMAL(14,2))) AS tot,
  round(avg(CAST(o_totalprice AS DECIMAL(14,2)) * CAST(0.07 AS DECIMAL(4,2))), 3) AS tax,
  max(CAST(o_totalprice AS DECIMAL(14,2)) - CAST(100.50 AS DECIMAL(6,2))) AS mx
FROM orders GROUP BY o_orderstatus
