-- three chained LEFT OUTER joins with per-join ON filters
SELECT count(*) AS total, count(o.o_orderkey) AS w_orders,
       count(n.n_name) AS w_nation, count(r.r_name) AS w_region
FROM customer c
LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 250000
LEFT OUTER JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_regionkey <= 1
LEFT OUTER JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name <> 'ASIA'
