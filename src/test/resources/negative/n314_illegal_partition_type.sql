-- reference: ql/src/test/queries/clientnegative/illegal_partition_type.q
-- + illegal_partition_type4.q — a partition VALUE that does not parse as
-- the partition column's declared type (day INT given 'second') is
-- refused, never stored as a stringly-typed directory.
-- ERROR-CONTAINS: CAST_INVALID_INPUT | cannot be cast | invalid partition
DROP TABLE IF EXISTS neg_ipt_tab1;
CREATE TABLE neg_ipt_tab1 (id1 INT, id2 STRING)
  USING parquet PARTITIONED BY (month STRING, day INT);
ALTER TABLE neg_ipt_tab1 ADD PARTITION (month='June', day='second');
