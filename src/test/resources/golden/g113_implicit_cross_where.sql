SELECT r.r_name, count(*) AS n
FROM nation n, region r
WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey < 20
GROUP BY r.r_name
