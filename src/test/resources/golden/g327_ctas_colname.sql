-- ctas_colname.q: unaliased CTAS expression columns take Hive's
-- positional names (_c1, _c2, ... — SemanticAnalyzer
-- getColumnInternalName); bare column refs keep their own name. The
-- follow-up SELECT references the generated names, exactly what a
-- migrating script does.
DROP TABLE IF EXISTS g327_t;
CREATE TABLE g327_t AS
SELECT n_regionkey, count(1), max(n_name), n_regionkey + 100
FROM nation GROUP BY n_regionkey;
SELECT n_regionkey, _c1, _c2, _c3 FROM g327_t ORDER BY n_regionkey;
