-- reference: ql/src/test/queries/clientnegative/create_function_nonudf_class.q
-- — the USING JAR resource exists and ships, but the named class is not
-- any UDF shape (UDF / GenericUDF / UDF0..22): registration must refuse.
-- ERROR-CONTAINS: CANNOT_LOAD_FUNCTION_CLASS | NO_HANDLER_FOR_UDAF | does not implement | cannot load class
CREATE TEMPORARY FUNCTION neg_notudf AS 'java.lang.StringBuilder' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT neg_notudf(n_name) FROM nation LIMIT 1;
