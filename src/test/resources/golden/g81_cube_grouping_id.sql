SELECT o_orderstatus, o_orderpriority, grouping(o_orderstatus) AS g1,
  grouping_id() AS gid, count(*) AS n
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
HAVING grouping_id() IN (0, 1, 3)
