-- reference: ql/src/test/queries/clientnegative/exchange_partition_neg_test.q (format leg)
-- the partition files move verbatim: mixed formats are refused
-- ERROR-CONTAINS: storage formats differ
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exf1;
DROP TABLE IF EXISTS graft_tmp.neg_exf2;
CREATE TABLE graft_tmp.neg_exf1 (f1 STRING) USING parquet PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_exf1';
CREATE TABLE graft_tmp.neg_exf2 (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_exf2';
ALTER TABLE graft_tmp.neg_exf2 ADD PARTITION (ds='1');
ALTER TABLE graft_tmp.neg_exf1 EXCHANGE PARTITION (ds='1') WITH TABLE graft_tmp.neg_exf2;
