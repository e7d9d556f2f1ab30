-- reference: ql/src/test/queries/clientnegative/dyn_part_max_per_node.q —
-- hive.exec.max.dynamic.partitions.pernode caps what one node creates;
-- a single-job write here makes it the binding cap when tighter.
-- ERROR-CONTAINS: more than hive.exec.max.dynamic.partitions.pernode
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_dynpn;
CREATE TABLE graft_tmp.neg_dynpn (a STRING, p STRING) USING parquet PARTITIONED BY (p) LOCATION '${NEGTMP}/neg_dynpn';
SET hive.exec.max.dynamic.partitions.pernode=2;
INSERT OVERWRITE TABLE graft_tmp.neg_dynpn PARTITION (p) SELECT n_name, CAST(n_nationkey AS STRING) FROM nation;
