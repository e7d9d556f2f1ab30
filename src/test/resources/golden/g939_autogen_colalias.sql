-- autogen_colalias.q: CTAS output columns without aliases get Hive's
-- POSITIONAL _cN names (SemanticAnalyzer getColumnInternalName) so a
-- later `SELECT _c0 ...` works; explicit aliases win.
DROP TABLE IF EXISTS g939_auto;
CREATE TABLE g939_auto USING parquet AS
SELECT 1+1, 2+2 AS zz, n_regionkey, count(n_name), sin(count(n_name))
FROM nation GROUP BY n_regionkey;
SELECT _c0, zz, n_regionkey, _c3, round(_c4, 6) AS s
FROM g939_auto ORDER BY n_regionkey
