WITH base AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey <= 200)
SELECT a.o_custkey, count(*) AS n
FROM base a JOIN base b ON a.o_custkey = b.o_custkey AND a.o_totalprice <= b.o_totalprice
GROUP BY a.o_custkey
HAVING count(*) > 1
