-- reference: ql/src/test/queries/clientnegative/invalid_cast_to_binary_2.q
-- (+ _3, _4, _5, _6: tinyint/smallint/bigint/float/double variants) —
-- numeric types do not cast to BINARY.
-- ERROR-CONTAINS: binary | BINARY | cast
SELECT CAST(CAST(1.4 AS DOUBLE) AS BINARY) FROM nation TABLESAMPLE (1 ROWS);
