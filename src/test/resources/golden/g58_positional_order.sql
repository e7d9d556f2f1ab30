SELECT o_orderstatus, count(*) AS n
FROM orders GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 5
