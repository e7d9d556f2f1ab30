-- vectorization_short_regress.q: unary minus, modulo and integer
-- division corner shapes Hive vectorizes specially.
SELECT l_linenumber,
       sum(-l_quantity) AS nq,
       sum(l_partkey % 7) AS m7,
       sum(CAST(l_partkey / 3 AS BIGINT)) AS d3
FROM lineitem
WHERE l_orderkey < 1000
GROUP BY l_linenumber
ORDER BY l_linenumber;
