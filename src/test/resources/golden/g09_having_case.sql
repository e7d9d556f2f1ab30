SELECT CASE WHEN o_totalprice > 300000 THEN 'hi' ELSE 'lo' END AS seg, count(*) AS n
FROM orders GROUP BY 1 HAVING count(*) > 10
