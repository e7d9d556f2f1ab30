SELECT r1.r_name, r2.r_name AS other
FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey <> r2.r_regionkey
