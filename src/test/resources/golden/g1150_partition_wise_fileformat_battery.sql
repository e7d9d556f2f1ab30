-- reference: ql/src/test/queries/clientpositive/
-- partition_wise_fileformat3.q + partition_wise_fileformat4.q +
-- partition_wise_fileformat5.q + partition_wise_fileformat6.q +
-- partition_wise_fileformat7.q + partition_wise_fileformat8.q +
-- partition_wise_fileformat9.q + partition_wise_fileformat10.q +
-- partition_wise_fileformat12.q + partition_wise_fileformat13.q +
-- partition_wise_fileformat14.q + partition_wise_fileformat15.q +
-- partition_wise_fileformat16.q + partition_wise_fileformat17.q +
-- partition_wise_fileformat18.q — one table whose partitions live in
-- THREE formats (sequencefile → rcfile → parquet via SET FILEFORMAT
-- between inserts): per-partition counts, a cross-partition aggregate,
-- and a single-partition filtered read all see every row.
DROP TABLE IF EXISTS g1150_t;
CREATE TABLE g1150_t (key INT, value STRING)
  PARTITIONED BY (dt STRING) STORED AS SEQUENCEFILE;
INSERT OVERWRITE TABLE g1150_t PARTITION (dt='100')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
ALTER TABLE g1150_t SET FILEFORMAT RCFILE;
INSERT OVERWRITE TABLE g1150_t PARTITION (dt='101')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
ALTER TABLE g1150_t SET FILEFORMAT PARQUET;
INSERT OVERWRITE TABLE g1150_t PARTITION (dt='102')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
SELECT
  (SELECT count(*) FROM g1150_t) AS total,
  (SELECT count(*) FROM g1150_t WHERE dt = '100') AS seq_cnt,
  (SELECT count(*) FROM g1150_t WHERE dt = '101') AS rc_cnt,
  (SELECT count(*) FROM g1150_t WHERE dt = '102') AS parq_cnt,
  (SELECT sum(key) FROM g1150_t WHERE dt >= '100') AS sk
