-- groupby_grouping_sets5.q: WITH CUBE over an ALREADY-GROUPED subquery
-- (the inner group-by dedups, the outer cube counts groups).
SELECT a, b, count(*) AS n FROM
  (SELECT n_regionkey AS a, n_nationkey % 2 AS b, count(1) AS c
   FROM nation GROUP BY n_regionkey, n_nationkey % 2) subq1
GROUP BY a, b WITH CUBE
