-- string literals compared against DATE columns coerce to date
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
GROUP BY o_orderpriority
