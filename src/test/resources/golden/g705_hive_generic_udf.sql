-- reference: ql/exec/FunctionTask.java:164-166 +
-- parse/FunctionSemanticAnalyzer.java:134 — CREATE FUNCTION ... USING JAR
-- ships the resource into the session and reflection-dispatches an
-- arbitrary GenericUDF subclass (udf/generic/GenericUDF.java:46). The
-- fixture jar is repo-local (source: RepeatTag.java beside it) because
-- the environment is zero-egress; the surface under test is the
-- resource clause -> session classloader -> GenericUDF adapter
-- (initialize over ObjectInspectors, constant-OI int arg, Text return).
CREATE TEMPORARY FUNCTION g705_repeat_tag AS 'graftjar.RepeatTag' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT n_name, g705_repeat_tag(n_name, 2) AS tagged
FROM nation WHERE n_nationkey < 5;
