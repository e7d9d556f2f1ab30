-- reference: ql/src/test/queries/clientnegative/alter_partition_coltype_2columns.q
-- ALTER TABLE ... PARTITION COLUMN takes exactly ONE (col type) pair —
-- retyping two keys in one statement is refused at parse.
-- ERROR-CONTAINS: PARSE_SYNTAX_ERROR | ParseException | syntax error | not supported
DROP TABLE IF EXISTS neg_coltype3;
CREATE TABLE neg_coltype3 (key STRING, value STRING)
  USING parquet PARTITIONED BY (dt STRING, ts STRING);
ALTER TABLE neg_coltype3 PARTITION COLUMN (dt INT, ts INT);
