-- Hive-dialect window over a GROUP BY with sort on the aggregate itself
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
  rank() over (distribute by o_orderstatus sort by count(*) desc, o_orderpriority) AS r
FROM orders
GROUP BY o_orderstatus, o_orderpriority
