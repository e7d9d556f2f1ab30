-- reference: ql/src/test/queries/clientpositive/
-- alter_partition_format_loc.q (+ partition_wise_fileformat12..14
-- retype shapes) — per-PARTITION SET FILEFORMAT: one partition
-- rewritten as RCFILE while its sibling stays parquet; both read in
-- one scan.
DROP TABLE IF EXISTS g1161_t;
CREATE TABLE g1161_t (key INT, value STRING)
  PARTITIONED BY (dt STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1161_t PARTITION (dt='100')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 10;
INSERT OVERWRITE TABLE g1161_t PARTITION (dt='101')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey >= 10;
ALTER TABLE g1161_t PARTITION (dt='100') SET FILEFORMAT RCFILE;
INSERT OVERWRITE TABLE g1161_t PARTITION (dt='100')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 10;
SELECT (SELECT count(*) FROM g1161_t) AS total,
       (SELECT count(*) FROM g1161_t WHERE dt='100') AS rc_part,
       (SELECT sum(key) FROM g1161_t) AS sk
