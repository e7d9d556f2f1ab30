-- decimal aggregates: sum/avg scale growth, min/max passthrough
SELECT o_orderstatus,
  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
  avg(CAST(o_totalprice AS DECIMAL(18,2))) AS a,
  max(CAST(o_totalprice AS DECIMAL(18,2))) AS mx
FROM orders GROUP BY o_orderstatus
