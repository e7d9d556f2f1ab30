-- IN with mixed literal types (string key vs int list: permissive coercion)
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_orderstatus IN ('F', 'O') AND o_custkey IN (1, 2.0, '3', 4, 5, 6, 7, 8, 9, 10)
GROUP BY o_orderstatus
