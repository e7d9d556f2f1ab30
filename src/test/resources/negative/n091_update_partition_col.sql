-- reference: ql/src/test/queries/clientnegative/update_partition_col.q
-- UPDATE may not set a partition column (UpdateDeleteSemanticAnalyzer)
-- ERROR-CONTAINS: cannot set partition column
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_updpart;
CREATE TABLE graft_tmp.neg_updpart (a STRING) USING parquet PARTITIONED BY (p STRING) LOCATION '${NEGTMP}/neg_updpart';
INSERT INTO graft_tmp.neg_updpart PARTITION (p='1') VALUES ('x');
UPDATE graft_tmp.neg_updpart SET p = '2' WHERE a = 'x';
