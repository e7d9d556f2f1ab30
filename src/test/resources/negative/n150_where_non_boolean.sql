-- reference: ql/src/test/queries/clientnegative/udf_when_type_wrong.q
-- (boolean-context family): a non-boolean WHERE condition
-- ERROR-CONTAINS: FILTER_NOT_BOOLEAN | data type mismatch
SELECT n_name FROM nation WHERE 5;
