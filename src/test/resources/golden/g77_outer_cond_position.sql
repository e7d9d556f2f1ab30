SELECT 'on' AS mode, count(*) AS n
FROM orders o LEFT JOIN customer c
  ON o.o_custkey = c.c_custkey AND c.c_acctbal > 5000
UNION ALL
SELECT 'where' AS mode, count(*) AS n
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 5000
