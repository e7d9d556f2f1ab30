-- subquery_exists_having.q: correlated EXISTS inside HAVING over a
-- grouped query.
SELECT b.o_custkey, count(*) AS n
FROM orders b
GROUP BY b.o_custkey
HAVING EXISTS (SELECT a.o_custkey FROM orders a
               WHERE a.o_custkey = b.o_custkey
                 AND a.o_totalprice > 250000)
