SELECT TRANSFORM(n_nationkey, n_name) USING 'cat' AS (k STRING, v STRING)
FROM nation WHERE n_nationkey < 5
