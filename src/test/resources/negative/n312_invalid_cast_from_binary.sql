-- reference: ql/src/test/queries/clientnegative/invalid_cast_from_binary_1.q
-- (+ invalid_cast_from_binary_2.q, invalid_cast_from_binary_3.q,
-- invalid_cast_from_binary_4.q, invalid_cast_from_binary_5.q,
-- invalid_cast_from_binary_6.q: the other numeric targets) — BINARY does not cast to the
-- numeric family; refused at analysis, never byte-reinterpreted.
-- ERROR-CONTAINS: cannot cast | DATATYPE_MISMATCH
SELECT cast(cast('2' AS BINARY) AS INT) FROM nation LIMIT 1;
