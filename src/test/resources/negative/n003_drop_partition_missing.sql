-- reference: ql/src/test/queries/clientnegative/drop_partition_failure.q
-- DROP PARTITION without IF EXISTS must refuse a spec matching nothing
-- ERROR-CONTAINS: no partition of | PARTITIONS_NOT_FOUND
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_mp;
CREATE TABLE graft_tmp.neg_mp (a STRING) USING `graft-seq` PARTITIONED BY (b STRING, c STRING) LOCATION '${NEGTMP}/neg_mp';
ALTER TABLE graft_tmp.neg_mp ADD PARTITION (b='1', c='1');
ALTER TABLE graft_tmp.neg_mp DROP PARTITION (b='3');
