-- reference: ql/src/test/queries/clientnegative/alter_partition_nodrop.q
-- NO_DROP protection refuses the drop
-- ERROR-CONTAINS: protected from being dropped
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_nodrop;
CREATE TABLE graft_tmp.neg_nodrop (a STRING) USING `graft-seq` PARTITIONED BY (p STRING) LOCATION '${NEGTMP}/neg_nodrop';
ALTER TABLE graft_tmp.neg_nodrop ADD PARTITION (p='x');
ALTER TABLE graft_tmp.neg_nodrop PARTITION (p='x') ENABLE NO_DROP;
ALTER TABLE graft_tmp.neg_nodrop DROP PARTITION (p='x');
