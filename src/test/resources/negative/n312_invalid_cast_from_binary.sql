-- reference: ql/src/test/queries/clientnegative/invalid_cast_from_binary_1.q
-- (+ _2.._6: the other numeric targets) — BINARY does not cast to the
-- numeric family; refused at analysis, never byte-reinterpreted.
-- ERROR-CONTAINS: cannot cast | DATATYPE_MISMATCH
SELECT cast(cast('2' AS BINARY) AS INT) FROM nation LIMIT 1;
