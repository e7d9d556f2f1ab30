-- reference: ql/src/test/queries/clientnegative/dyn_part2.q
-- dynamic partition strict mode needs at least one static partition column
-- ERROR-CONTAINS: strict mode requires at least one static partition
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_dynstrict;
CREATE TABLE graft_tmp.neg_dynstrict (a STRING) USING parquet PARTITIONED BY (p STRING) LOCATION '${NEGTMP}/neg_dynstrict';
SET hive.exec.dynamic.partition.mode=strict;
INSERT OVERWRITE TABLE graft_tmp.neg_dynstrict PARTITION (p) SELECT n_name, CAST(n_regionkey AS STRING) FROM nation;
