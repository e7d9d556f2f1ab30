-- reference: ql/src/test/queries/clientnegative/create_unknown_udf_udaf.q
-- CREATE FUNCTION pointing at a class that is not on the classpath
-- ERROR-CONTAINS: CANNOT_LOAD_FUNCTION_CLASS | Cannot load class
CREATE TEMPORARY FUNCTION neg_unknown AS 'org.nonexistent.NoSuchUdf';
SELECT neg_unknown(n_name) FROM nation;
