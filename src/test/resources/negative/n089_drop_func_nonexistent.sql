-- reference: ql/src/test/queries/clientnegative/drop_func_nonexistent.q
-- dropping a function that was never created
-- ERROR-CONTAINS: not registered | UNRESOLVED_ROUTINE
DROP FUNCTION graft_no_such_function_xyz;
