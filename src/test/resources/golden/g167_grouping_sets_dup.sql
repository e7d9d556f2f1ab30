-- groupby_grouping_sets1.q: duplicate sets ((a),(a))
SELECT o_orderstatus, count(*) AS n FROM orders
GROUP BY o_orderstatus GROUPING SETS ((o_orderstatus), (o_orderstatus))
