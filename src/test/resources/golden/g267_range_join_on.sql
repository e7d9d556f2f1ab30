-- non-equi range condition inside INNER JOIN ON
SELECT n.n_name, count(*) AS n_sup
FROM nation n JOIN supplier s
ON s.s_nationkey = n.n_nationkey AND s.s_acctbal BETWEEN 1000 AND 5000
GROUP BY n.n_name
