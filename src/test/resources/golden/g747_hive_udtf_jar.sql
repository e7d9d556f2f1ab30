-- the table-generating face of CREATE FUNCTION ... USING JAR: an
-- arbitrary GenericUDTF subclass (udf/generic/GenericUDTF.java:37 —
-- initialize -> StructObjectInspector, process/forward, close()) runs
-- as a Catalyst Generator in LATERAL VIEW position.
CREATE TEMPORARY FUNCTION g747_tok AS 'graftjar.TokenExplode' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT n.n_name, t.token, t.len
FROM nation n LATERAL VIEW g747_tok(n.n_name) t AS token, len
WHERE n.n_nationkey < 3 AND t.token != '__rows';
