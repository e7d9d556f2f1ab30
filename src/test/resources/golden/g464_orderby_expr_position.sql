-- order2.q / orderby battery: ORDER BY an expression over a subquery
-- alias plus LIMIT — deterministic because the key is unique.
SELECT n_nationkey AS k, n_name AS v
FROM (SELECT n_nationkey, n_name FROM nation) x
ORDER BY k % 7, v
LIMIT 10
