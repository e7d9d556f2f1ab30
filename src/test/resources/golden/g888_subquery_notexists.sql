-- subquery_notexists.q: uncorrelated-free NOT EXISTS, correlated on two
-- columns (b.value = a.value AND a.key = b.key) with an extra local
-- predicate — rows survive only when NO matching row passes the filter.
SELECT n_nationkey, n_name
FROM nation b
WHERE NOT EXISTS (
  SELECT a.c_custkey
  FROM customer a
  WHERE a.c_nationkey = b.n_nationkey AND a.c_acctbal > 9000
)
ORDER BY n_nationkey
