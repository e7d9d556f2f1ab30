-- reference: ql/src/test/queries/clientnegative/udf_elt_wrong_args_len.q
-- elt with a single argument
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires > 1 parameters
SELECT elt(1) FROM nation;
