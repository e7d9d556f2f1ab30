-- vectorization_13.q shape: boolean-filter combinations with CASE chains,
-- abs/floor/ceil/round over expressions, grouped.
SELECT l_returnflag,
       SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS n_big,
       SUM(CASE WHEN l_discount BETWEEN 0.05 AND 0.07 THEN 1 WHEN l_discount > 0.07 THEN 2 ELSE 0 END) AS disc_code,
       MIN(FLOOR(l_extendedprice / 1000)) AS min_k,
       MAX(CEIL(l_discount * 100)) AS max_disc_pct,
       SUM(ABS(CAST(l_linenumber AS INT) - 4)) AS sum_absdev
FROM lineitem
WHERE (l_linenumber < 5 AND l_quantity > 10) OR (l_linenumber >= 5 AND l_discount < 0.05)
GROUP BY l_returnflag
