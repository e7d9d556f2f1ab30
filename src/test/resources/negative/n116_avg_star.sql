-- reference: ql/src/test/queries/clientnegative/invalid_avg_syntax.q
-- avg(*) is not a thing: the star expands to every column
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires 1 parameters
SELECT avg(*) FROM nation;
