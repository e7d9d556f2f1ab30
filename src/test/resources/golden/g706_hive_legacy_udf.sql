-- the legacy pre-GenericUDF shape: a UDF subclass with evaluate()
-- overloads, resolved per argument type through the bridge
-- (reference udf/generic/GenericUDFBridge.java:167) — here the long
-- overload for a numeric argument and the String overload for a string
-- argument, out of the same session jar.
CREATE TEMPORARY FUNCTION g706_plus_one AS 'graftjar.LegacyPlusOne' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT n_nationkey,
       g706_plus_one(CAST(n_nationkey AS BIGINT)) AS bumped,
       g706_plus_one(n_name) AS suffixed
FROM nation WHERE n_nationkey < 5;
