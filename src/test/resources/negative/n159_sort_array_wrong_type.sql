-- reference: ql/src/test/queries/clientnegative/udf_sort_array_wrong1.q
-- sort_array over a non-array argument
-- ERROR-CONTAINS: UNEXPECTED_INPUT_TYPE | data type mismatch
SELECT sort_array(n_name) FROM nation;
