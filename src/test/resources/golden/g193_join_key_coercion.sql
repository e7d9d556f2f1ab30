-- join key coercion: bigint = string
SELECT count(*) AS n FROM orders o
JOIN (SELECT CAST(o_orderkey AS STRING) AS sk FROM orders WHERE o_orderkey < 100) s
ON o.o_orderkey = s.sk
