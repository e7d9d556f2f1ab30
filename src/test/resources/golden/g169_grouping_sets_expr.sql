-- groupby_grouping_sets1.q: expression grouping set
SELECT o_custkey % 10 + o_custkey % 3 AS k, count(*) AS n FROM orders
GROUP BY o_custkey % 10 + o_custkey % 3
GROUPING SETS (o_custkey % 10 + o_custkey % 3)
