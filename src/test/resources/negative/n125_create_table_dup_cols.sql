-- reference: ql/src/test/queries/clientnegative/create_skewed_table_dup_col_name.q
-- (duplicate-column family): CREATE TABLE with the same column twice
-- ERROR-CONTAINS: COLUMN_ALREADY_EXISTS | already exists
CREATE TABLE neg_dup_cols (c INT, c STRING) USING PARQUET;
