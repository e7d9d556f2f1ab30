SELECT c.c_nationkey, x, row_number() OVER (PARTITION BY c.c_nationkey ORDER BY x, c.c_custkey) AS rn
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_regionkey = 0
LATERAL VIEW explode(array(c.c_custkey, c.c_custkey * 2)) t AS x
WHERE c.c_custkey <= 40
