SELECT o_orderkey,
  CASE WHEN rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) <= 3
       THEN 'top3' ELSE 'rest' END AS tier
FROM orders WHERE o_orderkey <= 120
