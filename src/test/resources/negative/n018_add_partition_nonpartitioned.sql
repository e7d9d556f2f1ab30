-- reference: ql/src/test/queries/clientnegative/alter_table_add_partition.q
-- ERROR-CONTAINS: not partitioned | NOT_PARTITIONED | add partition is not allowed
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_nopart;
CREATE TABLE graft_tmp.neg_nopart (a INT) USING parquet LOCATION '${NEGTMP}/neg_nopart';
ALTER TABLE graft_tmp.neg_nopart ADD PARTITION (b='1');
