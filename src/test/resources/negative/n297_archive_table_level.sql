-- reference: ql/src/test/queries/clientnegative/archive3.q
-- ARCHIVE operates on PARTITIONS — a table-level ALTER TABLE ... ARCHIVE
-- with no partition spec is refused.
-- ERROR-CONTAINS: PARSE_SYNTAX_ERROR | ParseException | syntax error | ARCHIVE can only be run on partitions
DROP TABLE IF EXISTS neg297_t;
CREATE TABLE neg297_t (k INT) USING parquet PARTITIONED BY (ds STRING);
ALTER TABLE neg297_t ARCHIVE;
