-- reference: ql/src/test/queries/clientnegative/dyn_part1.q
-- hive.exec.max.dynamic.partitions caps the partitions one INSERT creates
-- ERROR-CONTAINS: more than hive.exec.max.dynamic.partitions
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_dynmax;
CREATE TABLE graft_tmp.neg_dynmax (a STRING) USING parquet PARTITIONED BY (p STRING) LOCATION '${NEGTMP}/neg_dynmax';
SET hive.exec.max.dynamic.partitions=2;
INSERT OVERWRITE TABLE graft_tmp.neg_dynmax PARTITION (p) SELECT n_name, CAST(n_nationkey AS STRING) FROM nation;
