SELECT o_orderstatus,
  percentile(o_totalprice, 0.5) AS p50,
  percentile(o_totalprice, array(0.25, 0.75)) AS quartiles,
  round(avg(o_totalprice), 2) AS mean
FROM orders GROUP BY o_orderstatus
