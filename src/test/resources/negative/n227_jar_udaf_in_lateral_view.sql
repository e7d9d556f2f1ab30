-- reference: FunctionRegistry placement rules — an AGGREGATE class
-- (GenericUDAFResolver) cannot serve as the generator of LATERAL VIEW
-- ERROR-CONTAINS: generator | not support | aggregate
DROP TEMPORARY FUNCTION IF EXISTS neg_jar_ss;
CREATE TEMPORARY FUNCTION neg_jar_ss AS 'graftjar.SumSquares' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT t.x FROM nation LATERAL VIEW neg_jar_ss(n_nationkey) t AS x;
