SELECT o_custkey, o_orderkey,
  round((o_totalprice - lag(o_totalprice) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) * 100) / 100 AS delta
FROM orders WHERE o_custkey < 15
