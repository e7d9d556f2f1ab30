-- reference: ql/src/test/queries/clientnegative/drop_native_udf.q
-- a built-in function cannot be dropped.
-- ERROR-CONTAINS: Cannot drop native function | built-in | SYSTEM function
DROP TEMPORARY FUNCTION max;
