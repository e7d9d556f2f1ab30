-- reference: ql/src/test/queries/clientnegative/exim_15_part_nonpart.q —
-- importing a PARTITIONED export into an existing NON-partitioned table.
-- ERROR-CONTAINS: partition | incompatible | does not match
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_imp_p_src;
DROP TABLE IF EXISTS graft_tmp.neg_imp_p_dst;
CREATE TABLE graft_tmp.neg_imp_p_src (k INT, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO graft_tmp.neg_imp_p_src PARTITION (ds='d1') VALUES (1);
EXPORT TABLE graft_tmp.neg_imp_p_src TO '${NEGTMP}/neg_imp_p_exp';
CREATE TABLE graft_tmp.neg_imp_p_dst (k INT) USING parquet;
IMPORT TABLE graft_tmp.neg_imp_p_dst FROM '${NEGTMP}/neg_imp_p_exp';
