-- reference: ql/src/test/queries/clientnegative/exchange_partition_neg_partition_missing.q
-- no source partition matches the spec
-- ERROR-CONTAINS: no partition of
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exm1;
DROP TABLE IF EXISTS graft_tmp.neg_exm2;
CREATE TABLE graft_tmp.neg_exm1 (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_exm1';
CREATE TABLE graft_tmp.neg_exm2 (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_exm2';
ALTER TABLE graft_tmp.neg_exm1 EXCHANGE PARTITION (ds='2013-04-05') WITH TABLE graft_tmp.neg_exm2;
