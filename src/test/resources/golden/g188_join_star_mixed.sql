-- join32.q shape: LEFT OUTER with ON-filter chained into an inner join
SELECT n.n_name, count(o.o_orderkey) AS n_orders, count(*) AS n_rows
FROM customer c
LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_regionkey <= 2
GROUP BY n.n_name
