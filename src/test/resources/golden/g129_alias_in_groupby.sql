SELECT year(o_orderdate) AS y, o_orderstatus AS st, count(*) AS n
FROM orders
GROUP BY y, st
HAVING n > 20
ORDER BY y, st
