-- reference: ql/src/test/queries/clientnegative/udf_if_not_bool.q
-- if() whose condition is a string
-- ERROR-CONTAINS: UNEXPECTED_INPUT_TYPE | data type mismatch
SELECT if(n_name, 1, 2) FROM nation;
