-- reference: ql/src/test/queries/clientnegative/load_wrong_fileformat.q
-- LOAD is a blind file move: loading a text file into a SEQUENCEFILE
-- table is refused up front (the mismatch would otherwise surface at
-- the next read as corruption)
-- ERROR-CONTAINS: Wrong file format
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_lf_src;
CREATE TABLE graft_tmp.neg_lf_src (a STRING) USING `graft-text` LOCATION '${NEGTMP}/neg_lf_src';
INSERT INTO graft_tmp.neg_lf_src VALUES ('hello');
DROP TABLE IF EXISTS graft_tmp.neg_lf_t;
CREATE TABLE graft_tmp.neg_lf_t (a STRING) USING `graft-seq` LOCATION '${NEGTMP}/neg_lf_t';
LOAD DATA INPATH '${NEGTMP}/neg_lf_src' INTO TABLE graft_tmp.neg_lf_t;
