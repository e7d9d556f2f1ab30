-- reference: ql/src/test/queries/clientnegative/alter_partition_coltype_invalidtype.q
-- ALTER TABLE ... PARTITION COLUMN to a type that does not exist (TIME
-- is not a Hive type) is refused at parse/resolution.
-- ERROR-CONTAINS: time | DATATYPE_MISMATCH | not supported | UNSUPPORTED_DATATYPE | ParseException
DROP TABLE IF EXISTS neg_coltype2;
CREATE TABLE neg_coltype2 (key STRING, value STRING)
  USING parquet PARTITIONED BY (dt STRING, ts STRING);
ALTER TABLE neg_coltype2 PARTITION COLUMN (ts TIME);
