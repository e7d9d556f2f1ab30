-- decimal precision/scale propagation through +,-,*,/ and cast-to-string
SELECT CAST(o_orderkey AS DECIMAL(10,2)) + CAST(0.555 AS DECIMAL(10,3)) AS add_ps,
       CAST(o_orderkey AS DECIMAL(10,2)) * CAST(1.25 AS DECIMAL(5,2)) AS mul_ps,
       CAST(o_orderkey AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(5,0)) AS div_ps,
       CAST(CAST(o_orderkey AS DECIMAL(12,4)) AS STRING) AS s_scale
FROM orders WHERE o_orderkey <= 10
