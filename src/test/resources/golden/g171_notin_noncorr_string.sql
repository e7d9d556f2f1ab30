-- subquery_notin.q: non-agg non-corr NOT IN with string-order predicate
SELECT o_orderpriority, count(*) AS n FROM orders
WHERE o_orderpriority NOT IN (SELECT o_orderpriority FROM orders WHERE o_orderpriority > '3')
GROUP BY o_orderpriority
