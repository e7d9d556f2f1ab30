-- reference: ql/src/test/queries/clientnegative/udf_map_keys_arg_num.q
-- — map_keys with two maps refuses: exactly one argument.
-- ERROR-CONTAINS: map_keys | arguments | WRONG_NUM_ARGS
SELECT map_keys(map('a', '1'), map('b', '2'))
FROM nation TABLESAMPLE (1 ROWS);
