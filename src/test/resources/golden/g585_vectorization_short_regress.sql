-- vectorization_short_regress.q: a wide expression battery mixing unary
-- minus, nested arithmetic, casts and aggregates in one projection.
SELECT COUNT(*) AS cnt,
       ROUND(SUM(-(l_quantity) + l_extendedprice / 100) * 100) / 100 AS s1,
       ROUND(AVG(CAST(l_orderkey % 7 AS DOUBLE) * 1.5 - 2) * 1000000) / 1000000 AS s2,
       MAX(CAST(CAST(l_quantity AS INT) AS SMALLINT)) AS s3,
       MIN(-(CAST(l_linenumber AS TINYINT))) AS s4,
       ROUND(SUM(l_tax * l_discount * 10000)) AS s5,
       COUNT(DISTINCT l_linenumber) AS s6
FROM lineitem WHERE l_orderkey % 3 <> 0
