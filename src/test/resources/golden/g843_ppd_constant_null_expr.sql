-- ppd_constant_expr.q: NULL-propagating constant arithmetic (4 + NULL,
-- col - NULL, NULL + NULL) written through INSERT OVERWRITE into typed
-- columns — all three land as typed NULLs.
DROP TABLE IF EXISTS g843_pce;
CREATE TABLE g843_pce (c1 STRING, c2 INT, c3 DOUBLE) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g843_pce
SELECT 4 + NULL, n_nationkey - NULL, NULL + NULL WHERE n_nationkey < 3;
SELECT c1, c2, c3, c1 IS NULL AS n1, c2 IS NULL AS n2, c3 IS NULL AS n3
FROM g843_pce
