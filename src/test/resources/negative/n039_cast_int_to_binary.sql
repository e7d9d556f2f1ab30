-- reference: ql/src/test/queries/clientnegative/invalid_cast_to_binary_1.q
-- only string-family types cast to binary
-- ERROR-CONTAINS: can be cast into binary | DATATYPE_MISMATCH | cannot cast
SELECT CAST(n_nationkey AS BINARY) FROM nation LIMIT 1;
