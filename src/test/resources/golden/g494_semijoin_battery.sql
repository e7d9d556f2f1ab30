-- semijoin.q battery: LEFT SEMI with extra ON predicates, semi against a
-- grouped subquery, and the NOT-IN anti complement.
SELECT 'semi_pred' AS tag, n.n_name AS v
FROM nation n LEFT SEMI JOIN supplier s
  ON n.n_nationkey = s.s_nationkey AND s.s_acctbal > 5000
UNION ALL
SELECT 'semi_gby', n.n_name
FROM nation n LEFT SEMI JOIN (
  SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING count(1) > 40
) c ON n.n_nationkey = c.c_nationkey
UNION ALL
SELECT 'anti', n.n_name
FROM nation n
WHERE n.n_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
