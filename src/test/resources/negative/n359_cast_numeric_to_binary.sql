-- reference: ql/src/test/queries/clientnegative/invalid_cast_to_binary_2.q
-- (+ invalid_cast_to_binary_3.q, invalid_cast_to_binary_4.q,
-- invalid_cast_to_binary_5.q, invalid_cast_to_binary_6.q) —
-- numeric types do not cast to BINARY.
-- ERROR-CONTAINS: binary | BINARY | cast
SELECT CAST(CAST(1.4 AS DOUBLE) AS BINARY) FROM nation TABLESAMPLE (1 ROWS);
