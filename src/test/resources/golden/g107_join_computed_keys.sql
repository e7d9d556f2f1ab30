SELECT a.bucket, count(*) AS n, min(a.o_orderkey) AS mn
FROM (SELECT o_orderkey, o_orderkey % 5 AS bucket FROM orders WHERE o_orderkey <= 100) a
JOIN (SELECT n_nationkey, n_nationkey % 5 AS bucket FROM nation) b
  ON a.bucket = b.bucket
GROUP BY a.bucket
