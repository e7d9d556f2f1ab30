-- reference: ql/src/test/queries/clientnegative/alter_partition_coltype_invalidcolname.q
-- ALTER TABLE ... PARTITION COLUMN must name an actual partition key —
-- a data column (or absent name) is refused.
-- ERROR-CONTAINS: is not a partition column
DROP TABLE IF EXISTS neg_coltype1;
CREATE TABLE neg_coltype1 (key STRING, value STRING)
  USING parquet PARTITIONED BY (dt STRING, ts STRING);
ALTER TABLE neg_coltype1 PARTITION COLUMN (dd INT);
