SELECT DISTINCT o_orderstatus, year(o_orderdate) AS y, o_totalprice > 250000 AS big
FROM orders WHERE o_orderkey <= 300
