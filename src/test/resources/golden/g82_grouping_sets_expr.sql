SELECT substr(o_orderpriority, 1, 1) AS pfx, o_orderstatus, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((substr(o_orderpriority, 1, 1)),
                        (substr(o_orderpriority, 1, 1), o_orderstatus), ())
