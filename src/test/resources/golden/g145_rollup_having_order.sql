SELECT year(o_orderdate) AS y, o_orderstatus, count(*) AS n
FROM orders
GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
HAVING count(*) > 50
ORDER BY y NULLS FIRST, o_orderstatus NULLS FIRST
