-- reference: ql/src/test/queries/clientnegative/create_function_nonexistent_class.q
-- ERROR-CONTAINS: CANNOT_LOAD_FUNCTION_CLASS | UNRESOLVED_ROUTINE | cannot load class
CREATE TEMPORARY FUNCTION neg_no_fn AS 'no.such.Clazz';
SELECT neg_no_fn(n_nationkey) FROM nation LIMIT 1;
