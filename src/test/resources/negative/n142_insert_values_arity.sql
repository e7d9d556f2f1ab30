-- reference: ql/src/test/queries/clientnegative/insert_number_of_columns_mismatch (VALUES leg)
-- INSERT VALUES wider than the table
-- ERROR-CONTAINS: INSERT_COLUMN_ARITY_MISMATCH | too many data columns
DROP TABLE IF EXISTS neg_iva;
CREATE TABLE neg_iva (k STRING, v INT) USING PARQUET;
INSERT INTO neg_iva VALUES ('a', 1, 99);
