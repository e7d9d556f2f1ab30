-- auto_join6/7 shape: outer joins of filtered subqueries
SELECT count(*) AS n, sum(a.k1 + coalesce(b.k2, 0)) AS s FROM
  (SELECT n_nationkey AS k1 FROM nation WHERE n_nationkey BETWEEN 5 AND 20) a
FULL OUTER JOIN
  (SELECT n_nationkey AS k2 FROM nation WHERE n_nationkey BETWEEN 10 AND 25) b
ON a.k1 = b.k2
