-- groupby_grouping_sets1.q: project one col while grouping over three
SELECT o_orderstatus FROM orders
GROUP BY o_orderstatus, o_orderpriority, o_custkey % 3
GROUPING SETS (o_orderstatus, o_orderpriority, o_custkey % 3)
