-- reference: ql/src/test/queries/clientnegative/column_rename2.q
-- ALTER TABLE CHANGE renaming onto an already-existing column name
-- ERROR-CONTAINS: COLUMN_ALREADY_EXISTS | already exists
DROP TABLE IF EXISTS neg_cr2;
CREATE TABLE neg_cr2 (k STRING, v STRING) USING PARQUET;
ALTER TABLE neg_cr2 CHANGE k v STRING;
