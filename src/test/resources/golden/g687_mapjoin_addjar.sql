-- mapjoin_addjar.q: a class loaded at RUNTIME via ADD JAR drives a
-- broadcast (map) join — the jar is a repo-local fixture
-- (src/test/resources/jars, source: UpperConcat.java alongside it)
-- because the reference's external serde jar cannot be fetched in a
-- zero-egress environment; the surface under test is ADD JAR -> session
-- classloader
-- -> CREATE TEMPORARY FUNCTION -> use inside a MAPJOIN-hinted query.
ADD JAR src/test/resources/jars/graft-example-udf.jar;
CREATE TEMPORARY FUNCTION g687_upconcat AS 'graftjar.UpperConcat';
SELECT /*+ MAPJOIN(r) */ g687_upconcat(r.r_name, n.n_name) AS tagged,
       g687_upconcat(n.n_nationkey, r.r_name) AS coerced
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE n.n_nationkey < 10
