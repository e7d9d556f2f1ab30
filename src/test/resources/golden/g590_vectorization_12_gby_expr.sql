-- vectorization_12.q: GROUP BY a computed expression + HAVING over an
-- aggregate of another expression.
SELECT l_orderkey % 5 AS grp,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity * (1 - l_discount)) * 100) / 100 AS disc_qty,
       MAX(LENGTH(l_returnflag) + l_linenumber) AS max_len
FROM lineitem
GROUP BY l_orderkey % 5
HAVING COUNT(*) > 10
