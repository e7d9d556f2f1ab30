-- reference: ql/src/test/queries/clientnegative/invalid_cast_to_binary_1.q
-- (+ _2.._6: tinyint/smallint/bigint/float/double variants) — only
-- string-family and binary values may cast to BINARY; numeric casts are
-- refused at analysis.
-- ERROR-CONTAINS: can be cast into binary | cannot cast
SELECT cast(2 AS BINARY) FROM nation LIMIT 1;
