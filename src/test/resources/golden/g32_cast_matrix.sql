SELECT o_orderkey, CAST(o_orderkey AS STRING) AS s, CAST(o_orderkey AS DOUBLE) AS dd,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING) AS ds
FROM orders WHERE o_orderkey < 30
