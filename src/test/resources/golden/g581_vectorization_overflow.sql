-- vectorization_short_regress.q overflow edges: narrow-int casts wrap
-- (Java two's-complement, serde LazyByte), int arithmetic wraps, and
-- abs(INT_MIN) stays INT_MIN — never an error with ANSI off.
SELECT CAST(200 AS TINYINT) AS t_wrap,
       CAST(-200 AS TINYINT) AS t_wrap_neg,
       CAST(70000 AS SMALLINT) AS s_wrap,
       CAST(CAST(127 AS TINYINT) + CAST(1 AS TINYINT) AS TINYINT) AS t_inc,
       2147483647 + 1 AS i_inc,
       2147483647 * 2 AS i_mul,
       ABS(CAST(-2147483648 AS INT)) AS abs_min,
       CAST(9223372036854775807 AS BIGINT) + 1 AS l_inc,
       CAST(2147483648 AS INT) AS i_wrap_cast
