-- reference: ql/src/test/queries/clientnegative/udf_format_number_wrong1.q
-- (+ wrong2..wrong7: arity and argument-type variants) — format_number
-- demands exactly two arguments; the one-argument call is refused.
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires 2 parameters | Invalid number of arguments
SELECT format_number(12332.123456) FROM nation LIMIT 1;
