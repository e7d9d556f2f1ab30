-- reference: ql/src/test/queries/clientnegative/macro_unused_parameter.q (macro arity family)
-- calling a SQL macro with the wrong argument count
-- ERROR-CONTAINS: WRONG_NUM_ARGS | requires 2 | expects | arguments
CREATE TEMPORARY MACRO neg_add2 (x INT, y INT) x + y;
SELECT neg_add2(1) FROM nation LIMIT 1;
