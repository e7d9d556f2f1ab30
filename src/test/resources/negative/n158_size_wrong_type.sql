-- reference: ql/src/test/queries/clientnegative/udf_size_wrong_type.q
-- size over a scalar argument
-- ERROR-CONTAINS: UNEXPECTED_INPUT_TYPE | data type mismatch
SELECT size(n_regionkey) FROM nation;
