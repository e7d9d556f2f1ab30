WITH t AS (SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_custkey END AS k,
                  c_nationkey FROM customer)
SELECT c_nationkey, count(*) AS n_star, count(1) AS n_one, count(k) AS n_k,
  count(DISTINCT k % 7) AS nd
FROM t GROUP BY c_nationkey
