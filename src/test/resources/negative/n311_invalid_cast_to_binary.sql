-- reference: ql/src/test/queries/clientnegative/invalid_cast_to_binary_1.q
-- (+ invalid_cast_to_binary_2.q, invalid_cast_to_binary_3.q,
-- invalid_cast_to_binary_4.q, invalid_cast_to_binary_5.q,
-- invalid_cast_to_binary_6.q: tinyint/smallint/bigint/float/double) — only
-- string-family and binary values may cast to BINARY; numeric casts are
-- refused at analysis.
-- ERROR-CONTAINS: can be cast into binary | cannot cast
SELECT cast(2 AS BINARY) FROM nation LIMIT 1;
