-- subquery_notexists_having.q: NOT EXISTS in the HAVING clause over a
-- grouped query — the correlation references the GROUP BY columns
-- (b.key/b.value shapes), and a DISTINCT inside the subquery must not
-- change the result.
SELECT c_nationkey, count(*) AS n
FROM customer b
GROUP BY c_nationkey
HAVING NOT EXISTS (
  SELECT DISTINCT a.n_regionkey
  FROM nation a
  WHERE a.n_nationkey = b.c_nationkey AND a.n_regionkey >= 3
)
ORDER BY c_nationkey
