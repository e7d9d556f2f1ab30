-- reference: ql/src/test/queries/clientnegative/udf_if_wrong_args_len.q
-- if() with two arguments
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires 3 parameters
SELECT if(true, 1) FROM nation;
