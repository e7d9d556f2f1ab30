-- FULL OUTER JOIN with an ON filter: unmatched rows from BOTH sides survive
SELECT count(*) AS total, count(c.c_custkey) AS with_c, count(o.o_orderkey) AS with_o
FROM customer c FULL OUTER JOIN orders o
ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
