-- reference: ql/src/test/queries/clientpositive/num_op_type_conv.q —
-- NULL through +/-, bigint%tinyint, self-modulo, and the
-- string-operand modulo that coerces via double.
SELECT NULL + 7 AS a, 1.0 - NULL AS b, NULL + NULL AS c,
       CAST(21 AS BIGINT) % CAST(5 AS TINYINT) AS d,
       CAST(21 AS BIGINT) % CAST(21 AS BIGINT) AS e,
       9 % '3' AS f
FROM nation TABLESAMPLE (1 ROWS)
