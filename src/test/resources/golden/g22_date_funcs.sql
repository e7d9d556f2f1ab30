SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m
FROM orders WHERE o_orderkey < 40
