-- reference: ql/src/test/queries/clientnegative/invalid_arithmetic_type.q
-- multiplying a DATE is refused
-- ERROR-CONTAINS: DATATYPE_MISMATCH | BINARY_ARITHMETIC | requires
SELECT DATE '2001-01-01' * 2 FROM nation LIMIT 1;
