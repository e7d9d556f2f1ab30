SELECT count(*) AS n, sum(a.n_nationkey) AS s1, sum(b.n_nationkey) AS s2
FROM nation a LEFT JOIN nation b
  ON a.n_nationkey = b.n_nationkey AND b.n_regionkey > 2
