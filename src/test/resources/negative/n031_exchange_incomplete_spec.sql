-- reference: ql/src/test/queries/clientnegative/exchange_partition_neg_incomplete_partition.q
-- a spec naming a non-partition column is refused
-- ERROR-CONTAINS: is not a partition column
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exi1;
DROP TABLE IF EXISTS graft_tmp.neg_exi2;
CREATE TABLE graft_tmp.neg_exi1 (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING, hr STRING) LOCATION '${NEGTMP}/neg_exi1';
CREATE TABLE graft_tmp.neg_exi2 (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING, hr STRING) LOCATION '${NEGTMP}/neg_exi2';
ALTER TABLE graft_tmp.neg_exi2 ADD PARTITION (ds='1', hr='2');
ALTER TABLE graft_tmp.neg_exi1 EXCHANGE PARTITION (nosuch='1') WITH TABLE graft_tmp.neg_exi2;
