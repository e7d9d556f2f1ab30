-- the aggregate face of CREATE FUNCTION ... USING JAR: a GenericUDAF
-- resolver/evaluator (PARTIAL1 iterate/terminatePartial crossing the
-- shuffle, FINAL merge/terminate) from the session jar.
CREATE TEMPORARY FUNCTION g748_ss AS 'graftjar.SumSquares' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT n_regionkey, g748_ss(n_nationkey) AS ss
FROM nation GROUP BY n_regionkey;
