-- BETWEEN over date-vs-string coercion
SELECT count(*) AS n FROM orders WHERE o_orderdate BETWEEN '1994-01-01' AND '1994-12-31'
