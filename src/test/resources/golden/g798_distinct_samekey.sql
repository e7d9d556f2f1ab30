-- groupby_distinct_samekey.q: sum(DISTINCT x) grouped by the SAME column
-- x (each group's distinct-sum equals its key), once through an ordered
-- subquery and once direct — both shapes must agree.
SELECT q1.int1, sum(DISTINCT q1.int1) AS s
FROM (SELECT n_regionkey AS int1 FROM nation ORDER BY int1) q1
GROUP BY q1.int1
UNION ALL
SELECT n_regionkey AS int1, sum(DISTINCT n_regionkey) AS s
FROM nation GROUP BY n_regionkey
