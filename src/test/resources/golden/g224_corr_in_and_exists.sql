-- IN-subquery and correlated EXISTS combined in one predicate
SELECT count(*) AS n FROM customer c
WHERE c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
