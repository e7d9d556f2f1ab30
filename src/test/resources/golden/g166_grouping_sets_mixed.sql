-- groupby_grouping_sets1.q: SETS (a, (a,b), b, ())
SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
GROUP BY o_orderstatus, o_orderpriority
GROUPING SETS (o_orderstatus, (o_orderstatus, o_orderpriority), o_orderpriority, ())
