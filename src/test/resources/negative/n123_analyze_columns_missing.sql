-- reference: ql/src/test/queries/clientnegative/columnstats_tbllvl_incorrect_column.q
-- ANALYZE ... FOR COLUMNS naming a column the table does not have
-- ERROR-CONTAINS: COLUMN_NOT_FOUND | cannot be found
DROP TABLE IF EXISTS neg_anal_t;
CREATE TABLE neg_anal_t (k INT, v STRING) USING PARQUET;
ANALYZE TABLE neg_anal_t COMPUTE STATISTICS FOR COLUMNS no_such_col;
