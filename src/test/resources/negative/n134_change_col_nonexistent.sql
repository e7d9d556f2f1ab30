-- reference: ql/src/test/queries/clientnegative/column_rename1.q
-- ALTER TABLE CHANGE of a column that does not exist
-- ERROR-CONTAINS: no column src_not_exist
DROP TABLE IF EXISTS neg_cr1;
CREATE TABLE neg_cr1 (k STRING, v STRING) USING PARQUET;
ALTER TABLE neg_cr1 CHANGE src_not_exist key_value STRING;
