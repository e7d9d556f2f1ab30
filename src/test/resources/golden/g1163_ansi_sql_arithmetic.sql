-- reference: ql/src/test/queries/clientpositive/ansi_sql_arithmetic.q —
-- int / int under the engine's (hive.compat=0.12 default) arithmetic:
-- the quotient is DOUBLE; the exact-decimal form is reachable with an
-- explicit cast, as the stem's compat=latest half computes.
SELECT CAST(n_nationkey AS INT) / CAST(n_nationkey AS INT) AS q_double,
       CAST(CAST(n_nationkey AS DECIMAL(10,0)) /
            CAST(n_nationkey AS DECIMAL(10,0)) AS DECIMAL(10,6)) AS q_decimal
FROM nation WHERE n_nationkey = 7
