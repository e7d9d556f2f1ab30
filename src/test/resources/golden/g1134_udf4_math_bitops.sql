-- reference: ql/src/test/queries/clientpositive/udf4.q — round/floor/
-- ceil at halves, sqrt(-1) as NaN, unary chains (1++2, 1+-2), bitwise
-- NOT/AND/OR/XOR across tinyint/smallint/int/bigint widths.
SELECT round(1.0) AS r1, round(1.5) AS r2, round(-1.5) AS r3,
       floor(1.0) AS f1, floor(1.5) AS f2, floor(-1.5) AS f3,
       sqrt(1.0) AS s1, CAST(sqrt(-1.0) AS STRING) AS s2, sqrt(0.0) AS s3,
       ceil(1.0) AS c1, ceil(1.5) AS c2, ceil(-1.5) AS c3, ceiling(1.0) AS c4,
       +3 AS u1, -3 AS u2, 1 + +2 AS u3, 1 + -2 AS u4,
       ~1 AS n1, ~CAST(1 AS TINYINT) AS n2,
       ~CAST(1 AS SMALLINT) AS n3, ~CAST(1 AS BIGINT) AS n4,
       CAST(1 AS TINYINT) & CAST(2 AS TINYINT) AS a1, 1 & 2 AS a2,
       CAST(1 AS BIGINT) & CAST(2 AS BIGINT) AS a3,
       CAST(1 AS TINYINT) | CAST(2 AS TINYINT) AS o1, 1 | 2 AS o2,
       CAST(1 AS SMALLINT) ^ CAST(3 AS SMALLINT) AS x1, 1 ^ 3 AS x2
FROM nation TABLESAMPLE (1 ROWS)
