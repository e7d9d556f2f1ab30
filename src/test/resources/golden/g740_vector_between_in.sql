-- vectorization_short_regress.q: BETWEEN and IN filter legs.
SELECT l_linestatus, count(1) AS n
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 45
  AND l_returnflag IN ('A', 'N', 'R')
  AND l_orderkey < 5000
GROUP BY l_linestatus
ORDER BY l_linestatus;
