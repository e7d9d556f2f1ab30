-- reference: ql/src/test/queries/clientnegative/create_view_failure4.q
-- CREATE VIEW with a duplicate name in the column list
-- ERROR-CONTAINS: COLUMN_ALREADY_EXISTS | already exists
DROP TABLE IF EXISTS neg_vdc_t;
CREATE TABLE neg_vdc_t (k STRING, v STRING) USING PARQUET;
CREATE VIEW neg_vdc_v (x, x) AS SELECT k, v FROM neg_vdc_t;
