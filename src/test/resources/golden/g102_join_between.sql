SELECT b.r_name, count(*) AS n, min(a.n_nationkey) AS mn, max(a.n_nationkey) AS mx
FROM nation a JOIN region b
  ON a.n_regionkey = b.r_regionkey AND a.n_nationkey BETWEEN 5 AND 15
GROUP BY b.r_name
