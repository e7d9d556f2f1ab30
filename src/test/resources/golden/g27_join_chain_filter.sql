SELECT r_name, count(*) AS n
FROM region JOIN nation ON r_regionkey = n_regionkey
JOIN supplier ON n_nationkey = s_nationkey
WHERE s_acctbal > 0 GROUP BY r_name
