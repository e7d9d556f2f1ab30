-- reference: ql/src/test/queries/clientnegative/altern1.q (rename-conflict family)
-- ERROR-CONTAINS: TABLE_OR_VIEW_ALREADY_EXISTS | already exists
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_rn1;
DROP TABLE IF EXISTS graft_tmp.neg_rn2;
CREATE TABLE graft_tmp.neg_rn1 (a INT) USING parquet LOCATION '${NEGTMP}/neg_rn1';
CREATE TABLE graft_tmp.neg_rn2 (a INT) USING parquet LOCATION '${NEGTMP}/neg_rn2';
ALTER TABLE graft_tmp.neg_rn1 RENAME TO graft_tmp.neg_rn2;
