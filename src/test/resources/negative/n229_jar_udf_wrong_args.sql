-- reference: GenericUDF.initialize argument validation surfaces as the
-- compile-time UDFArgumentException (wrong arity refused, not NULLed)
-- ERROR-CONTAINS: argument | expects
DROP TEMPORARY FUNCTION IF EXISTS neg_jar_rt;
CREATE TEMPORARY FUNCTION neg_jar_rt AS 'graftjar.RepeatTag' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT neg_jar_rt() FROM nation;
