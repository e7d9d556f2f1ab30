-- reference: ql/src/test/queries/clientnegative/authorization_insert_noselectpriv.q
-- INSERT ... SELECT needs a Select grant on the SOURCE table even when
-- the target table's Insert side is fully granted.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_ins_src;
DROP TABLE IF EXISTS graft_tmp.neg_ins_tgt;
CREATE TABLE graft_tmp.neg_ins_src (i INT) USING parquet;
CREATE TABLE graft_tmp.neg_ins_tgt (i INT) USING parquet;
set hive.security.authorization.enabled=true;
GRANT INSERT ON TABLE graft_tmp.neg_ins_tgt TO ROLE public;
INSERT INTO graft_tmp.neg_ins_tgt SELECT i FROM graft_tmp.neg_ins_src;
