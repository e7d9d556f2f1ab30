SELECT k, count(*) AS n, sum(c_custkey) AS s
FROM (SELECT CASE WHEN c_nationkey % 6 = 0 THEN NULL ELSE c_nationkey END AS k, c_custkey
      FROM customer) t
GROUP BY k
