-- reference: ql/src/test/queries/clientnegative/exchange_partition_neg_table_missing2.q (identity leg)
-- ERROR-CONTAINS: same table
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exsame;
CREATE TABLE graft_tmp.neg_exsame (f1 STRING) USING `graft-seq` PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_exsame';
ALTER TABLE graft_tmp.neg_exsame ADD PARTITION (ds='1');
ALTER TABLE graft_tmp.neg_exsame EXCHANGE PARTITION (ds='1') WITH TABLE graft_tmp.neg_exsame;
