-- reference: ql/src/test/queries/clientnegative/invalid_select_column.q
-- A WHERE predicate naming a column the table does not have is an
-- invalid column reference.
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | Invalid table alias or column reference | cannot be resolved
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_invcol;
CREATE TABLE graft_tmp.neg_invcol (key STRING, value STRING) USING parquet;
SELECT * FROM graft_tmp.neg_invcol WHERE column1 = 123;
