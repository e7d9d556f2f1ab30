-- groupby_grouping_sets4.q: self-join of two WITH CUBE subqueries on
-- the grouping key (NULL grouping rows must not join).
SELECT subq1.a AS a1, subq1.b AS b1, subq1.n AS n1,
       subq2.b AS b2, subq2.n AS n2
FROM (SELECT n_regionkey AS a, n_name AS b, count(*) AS n FROM nation
      WHERE n_regionkey < 3 GROUP BY n_regionkey, n_name WITH CUBE) subq1
JOIN (SELECT n_regionkey AS a, n_name AS b, count(*) AS n FROM nation
      WHERE n_regionkey < 3 GROUP BY n_regionkey, n_name WITH CUBE) subq2
ON subq1.a = subq2.a
WHERE subq1.b IS NULL AND subq2.b IS NULL
