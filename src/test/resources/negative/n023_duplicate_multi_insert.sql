-- reference: ql/src/test/queries/clientnegative/duplicate_insert1.q
-- one multi-insert may not name the same destination twice
-- ERROR-CONTAINS: same table | multiple times | duplicate
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_dup1;
CREATE TABLE graft_tmp.neg_dup1 (k INT, v STRING) USING parquet LOCATION '${NEGTMP}/neg_dup1';
FROM nation
INSERT OVERWRITE TABLE graft_tmp.neg_dup1 SELECT n_nationkey, n_name
INSERT OVERWRITE TABLE graft_tmp.neg_dup1 SELECT n_nationkey, n_name;
