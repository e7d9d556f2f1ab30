-- EXISTS whose subquery contains a window function
SELECT count(*) AS n FROM customer c WHERE EXISTS (
  SELECT 1 FROM (
    SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn,
           o_totalprice
    FROM orders) t
  WHERE t.o_custkey = c.c_custkey AND t.rn = 1 AND t.o_totalprice > 250000)
