-- subquery_notin.q: tuple NOT IN
SELECT count(*) AS n FROM orders
WHERE (o_orderstatus, o_orderpriority) NOT IN
  (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey < 3)
