-- reference: ql/src/test/queries/clientnegative/udf_format_number_wrong1.q
-- format_number over a non-numeric first argument
-- ERROR-CONTAINS: UNEXPECTED_INPUT_TYPE | data type mismatch
SELECT format_number('x', 2) FROM nation;
