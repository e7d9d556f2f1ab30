-- reference: ql/src/test/queries/clientnegative/udf_instr_wrong_args_len.q
-- instr with a single argument
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires 2 parameters
SELECT instr('abc') FROM nation;
