-- reference: ql/src/test/queries/clientnegative/invalid_cast_from_binary_2.q
-- (+ _3, _4, _5, _6: to tinyint/smallint/bigint/float/double) — BINARY
-- does not cast to numeric types.
-- ERROR-CONTAINS: binary | BINARY | cast
SELECT CAST(binary('2') AS DOUBLE) FROM nation TABLESAMPLE (1 ROWS);
