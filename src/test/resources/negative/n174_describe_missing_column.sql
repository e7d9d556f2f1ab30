-- reference: ql/src/test/queries/clientnegative/desc_failure3.q
-- DESCRIBE of a column the table does not have
-- ERROR-CONTAINS: COLUMN_NOT_FOUND | cannot be found
DROP TABLE IF EXISTS neg_dmc;
CREATE TABLE neg_dmc (k STRING) USING PARQUET;
DESCRIBE neg_dmc no_such_col;
