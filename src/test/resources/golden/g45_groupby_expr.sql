SELECT year(o_orderdate) AS y, count(*) AS n FROM orders GROUP BY year(o_orderdate)
