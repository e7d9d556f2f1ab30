-- reference: ql/src/test/queries/clientnegative/illegal_partition_type2.q
-- (+ illegal_partition_type3.q) — an ADD PARTITION value that does not
-- parse as the declared partition-key type (day INT = 'second')
-- refuses.
-- ERROR-CONTAINS: second | type | invalid | cannot be cast
DROP TABLE IF EXISTS neg369_tab1;
CREATE TABLE neg369_tab1 (id1 INT, id2 STRING)
  PARTITIONED BY (month STRING, day INT) STORED AS PARQUET;
ALTER TABLE neg369_tab1 ADD PARTITION (month='June', day='second');
