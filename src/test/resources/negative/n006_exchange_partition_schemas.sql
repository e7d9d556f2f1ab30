-- reference: ql/src/test/queries/clientnegative/exchange_partition_neg_test.q
-- column schemas differ between source and destination
-- ERROR-CONTAINS: different schemas
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exs1;
DROP TABLE IF EXISTS graft_tmp.neg_exs2;
CREATE TABLE graft_tmp.neg_exs1 (f1 STRING, extra INT) USING `graft-seq` PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_exs1';
CREATE TABLE graft_tmp.neg_exs2 (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_exs2';
ALTER TABLE graft_tmp.neg_exs2 ADD PARTITION (ds='1');
ALTER TABLE graft_tmp.neg_exs1 EXCHANGE PARTITION (ds='1') WITH TABLE graft_tmp.neg_exs2;
