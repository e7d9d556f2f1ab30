SELECT /*+ STREAMTABLE(o) */ o.o_orderstatus, count(*) AS n
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_orderstatus
