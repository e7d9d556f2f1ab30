-- reference: ql/src/test/queries/clientnegative/udf_locate_wrong_args_len.q
-- (arity family): str_to_map with four arguments
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires [1, 2, 3] parameters
SELECT str_to_map('a=1', ',', '=', 'x') FROM nation;
