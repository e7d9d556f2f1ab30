-- reference: ql/src/test/queries/clientnegative/udf_locate_wrong_args_len.q
-- (arity family): substr with four arguments
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires [2, 3] parameters
SELECT substr('abc', 1, 2, 3) FROM nation;
