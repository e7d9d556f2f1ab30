-- reference: ql/src/test/queries/clientnegative/invalid_cast_from_binary_2.q
-- (+ invalid_cast_from_binary_3.q, invalid_cast_from_binary_4.q,
-- invalid_cast_from_binary_5.q, invalid_cast_from_binary_6.q) — BINARY
-- does not cast to numeric types.
-- ERROR-CONTAINS: binary | BINARY | cast
SELECT CAST(binary('2') AS DOUBLE) FROM nation TABLESAMPLE (1 ROWS);
