-- reference: ql/src/test/queries/clientpositive/drop_table_purge.q —
-- DROP TABLE ... PURGE (skip-trash drop) parses and removes the table.
CREATE TABLE IF NOT EXISTS g1131_temp (col STRING) USING parquet;
DROP TABLE g1131_temp PURGE;
SHOW TABLES LIKE 'g1131_temp'
