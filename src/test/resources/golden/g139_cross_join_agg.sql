SELECT r1.r_name, count(*) AS n
FROM region r1 CROSS JOIN region r2
WHERE r1.r_regionkey <> r2.r_regionkey
GROUP BY r1.r_name
