-- reference: HiveConf hive.exec.dynamic.partition=false refuses any
-- dynamic partition column (SemanticAnalyzer ErrorMsg 10096)
-- ERROR-CONTAINS: Dynamic partition is disabled
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_dyndis;
CREATE TABLE graft_tmp.neg_dyndis (a STRING) USING parquet PARTITIONED BY (p STRING) LOCATION '${NEGTMP}/neg_dyndis';
SET hive.exec.dynamic.partition=false;
INSERT OVERWRITE TABLE graft_tmp.neg_dyndis PARTITION (p) SELECT n_name, CAST(n_regionkey AS STRING) FROM nation;
