-- reference: ql/src/test/queries/clientnegative/columnstats_tbllvl.q shape
-- — ANALYZE ... FOR COLUMNS must name existing columns.
-- ERROR-CONTAINS: COLUMN_NOT_FOUND | does not exist | cannot be resolved
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_an1;
CREATE TABLE graft_tmp.neg_an1 (k INT) USING parquet;
ANALYZE TABLE graft_tmp.neg_an1 COMPUTE STATISTICS FOR COLUMNS nosuchcol;
