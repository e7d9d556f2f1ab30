-- subquery_in_having.q: HAVING count(*) IN (uncorrelated aggregate
-- subquery) — the group count must match SOME group count of the inner
-- grouped query.
SELECT o_custkey, count(*) AS n
FROM orders
GROUP BY o_custkey
HAVING count(*) IN (SELECT count(*) FROM orders s1
                    WHERE s1.o_custkey > 700 GROUP BY s1.o_custkey)
   AND o_custkey < 100
