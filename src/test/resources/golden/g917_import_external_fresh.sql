-- exim_19 success leg (ImportSemanticAnalyzer): IMPORT EXTERNAL TABLE
-- into a FRESH name re-points the copied dump as an external table —
-- only the import over an EXISTING table refuses (n264).
DROP TABLE IF EXISTS g917_dep;
DROP TABLE IF EXISTS g917_dep2;
CREATE TABLE g917_dep (dep_id INT) USING parquet;
INSERT INTO g917_dep VALUES (1), (2), (3);
EXPORT TABLE g917_dep TO '/tmp/graft_g917_exp';
IMPORT EXTERNAL TABLE g917_dep2 FROM '/tmp/graft_g917_exp';
SELECT dep_id FROM g917_dep2 ORDER BY dep_id
