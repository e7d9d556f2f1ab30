-- reference: analyze/partition-validation family — ANALYZE of a
-- partition that does not exist is refused
-- ERROR-CONTAINS: PARTITIONS_NOT_FOUND | not found | does not exist
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_anp;
CREATE TABLE graft_tmp.neg_anp (v INT) USING parquet
PARTITIONED BY (p STRING) LOCATION '${NEGTMP}/neg_anp';
INSERT INTO graft_tmp.neg_anp PARTITION (p='a') VALUES (1);
ANALYZE TABLE graft_tmp.neg_anp PARTITION (p='zzz') COMPUTE STATISTICS;
