-- reference: ql/src/test/queries/clientnegative/udf_if_not_bool.q (builtin arg-validation family)
-- a builtin called with the wrong argument count is refused
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires | expects | parameters
SELECT substring() FROM nation LIMIT 1;
