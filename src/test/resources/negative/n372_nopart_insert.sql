-- reference: ql/src/test/queries/clientnegative/nopart_insert.q (+
-- nopart_load.q) — INSERT into a partitioned table with NO partition
-- spec and no partition-column values refuses.
-- ERROR-CONTAINS: partition | not enough data columns | column
DROP TABLE IF EXISTS neg372_p;
CREATE TABLE neg372_p (a INT)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT INTO TABLE neg372_p SELECT CAST(n_nationkey AS INT) FROM nation;
