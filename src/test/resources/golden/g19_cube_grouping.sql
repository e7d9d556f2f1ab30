SELECT o_orderstatus, o_orderpriority, grouping(o_orderstatus) AS g1, count(*) AS n
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
