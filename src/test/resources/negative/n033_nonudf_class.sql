-- reference: ql/src/test/queries/clientnegative/udf_function_does_not_implement_udf.q
-- a loadable class that is not a UDF shape cannot register
-- ERROR-CONTAINS: CANNOT_LOAD_FUNCTION_CLASS | NO_HANDLER_FOR_UDAF | cannot load class
CREATE TEMPORARY FUNCTION neg_moo AS 'java.lang.String';
SELECT neg_moo(n_nationkey) FROM nation LIMIT 1;
