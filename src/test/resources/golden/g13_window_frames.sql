SELECT o_custkey, o_orderkey,
  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) * 100) / 100 AS w3
FROM orders WHERE o_custkey < 20
