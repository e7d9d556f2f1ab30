-- vectorization_short_regress.q (Timestamp class): date parts and
-- arithmetic over the date column under filters.
SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
       count(1) AS n, round(sum(l_quantity), 2) AS q
FROM lineitem
WHERE l_shipdate IS NOT NULL AND l_orderkey < 3000
GROUP BY year(l_shipdate), month(l_shipdate)
ORDER BY y, m LIMIT 24;
