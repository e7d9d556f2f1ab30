-- reference: ql/src/test/queries/clientnegative/udf_array_contains_wrong1.q
-- array_contains over a non-array first argument
-- ERROR-CONTAINS: UNEXPECTED_INPUT_TYPE | data type mismatch
SELECT array_contains(n_name, 'x') FROM nation;
