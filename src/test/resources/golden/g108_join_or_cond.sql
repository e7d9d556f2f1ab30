SELECT count(*) AS n, sum(a.n_nationkey + b.r_regionkey) AS s
FROM nation a JOIN region b
  ON a.n_regionkey = b.r_regionkey OR a.n_nationkey = b.r_regionkey
