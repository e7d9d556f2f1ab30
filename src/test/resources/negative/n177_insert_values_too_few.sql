-- reference: ql/src/test/queries/clientnegative/insert_number_of_columns_mismatch (too-few leg)
-- INSERT VALUES narrower than the table
-- ERROR-CONTAINS: NOT_ENOUGH_DATA_COLUMNS | arity
DROP TABLE IF EXISTS neg_ivf;
CREATE TABLE neg_ivf (k STRING, dt STRING) USING PARQUET PARTITIONED BY (dt);
INSERT INTO neg_ivf VALUES ('only_one');
