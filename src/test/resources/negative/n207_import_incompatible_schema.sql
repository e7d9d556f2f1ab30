-- reference: ql/src/test/queries/clientnegative/exim_05_nonpart_noncompat_coltype.q
-- — IMPORT into an existing table whose column types differ refuses the
-- append (the r12 validate step).
-- ERROR-CONTAINS: incompatible | does not match | schema
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_imp_src;
DROP TABLE IF EXISTS graft_tmp.neg_imp_dst;
CREATE TABLE graft_tmp.neg_imp_src (k INT) USING parquet;
INSERT INTO graft_tmp.neg_imp_src VALUES (1);
EXPORT TABLE graft_tmp.neg_imp_src TO '${NEGTMP}/neg_imp_exp';
CREATE TABLE graft_tmp.neg_imp_dst (k STRING) USING parquet;
IMPORT TABLE graft_tmp.neg_imp_dst FROM '${NEGTMP}/neg_imp_exp';
