-- cbo_semijoin.q: LEFT SEMI JOIN over derived tables chained with an
-- outer join, with filters above and below and a grouped HAVING tail.
SELECT a, c, count(*) AS n
FROM (
  SELECT t1.a, t3.n_regionkey AS c
  FROM (SELECT n_nationkey AS a, n_regionkey AS b FROM nation
        WHERE n_nationkey + 1 > 2) t1
  LEFT SEMI JOIN (SELECT n_nationkey AS p FROM nation
        WHERE n_regionkey >= 1) t2 ON t1.a = t2.p
  LEFT OUTER JOIN nation t3 ON t1.a = t3.n_nationkey
  WHERE t1.b + 1 >= 0
) r
WHERE a > 0
GROUP BY a, c
HAVING a >= 1 AND (a + c) >= 0
ORDER BY c, a
