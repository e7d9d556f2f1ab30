-- reference: ql/src/test/queries/clientnegative/exchange_partition_neg_partition_exists.q
-- the destination already holds the partition: the exchange is refused
-- ERROR-CONTAINS: already exists
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_ex1;
DROP TABLE IF EXISTS graft_tmp.neg_ex2;
CREATE TABLE graft_tmp.neg_ex1 (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_ex1';
CREATE TABLE graft_tmp.neg_ex2 (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_ex2';
ALTER TABLE graft_tmp.neg_ex1 ADD PARTITION (ds='2013-04-05');
ALTER TABLE graft_tmp.neg_ex2 ADD PARTITION (ds='2013-04-05');
ALTER TABLE graft_tmp.neg_ex1 EXCHANGE PARTITION (ds='2013-04-05') WITH TABLE graft_tmp.neg_ex2;
