-- reference: ql/src/test/queries/clientnegative/alter_table_add_partition.q
-- ADD PARTITION naming a column that is not a partition column is refused
-- ERROR-CONTAINS: PARTITION_COLUMN | not a partition column | PartitionSpec | partition spec
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_addp;
CREATE TABLE graft_tmp.neg_addp (a INT) USING parquet
PARTITIONED BY (b INT) LOCATION '${NEGTMP}/neg_addp';
ALTER TABLE graft_tmp.neg_addp ADD PARTITION (b='1', c='1');
