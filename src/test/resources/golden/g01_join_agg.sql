SELECT n_name, count(*) AS n, round(sum(s_acctbal) * 100) / 100 AS bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
