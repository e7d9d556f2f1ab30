SELECT n.n_name, count(*) AS n_cust
FROM customer c
LEFT SEMI JOIN orders o ON c.c_custkey = o.o_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_regionkey <= 1
GROUP BY n.n_name
