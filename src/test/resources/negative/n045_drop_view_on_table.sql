-- reference: ql/src/test/queries/clientnegative/drop_view_failure1.q
-- ERROR-CONTAINS: WRONG_COMMAND_FOR_OBJECT_TYPE | Cannot drop a table | is a table
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_dvt;
CREATE TABLE graft_tmp.neg_dvt (a INT) USING parquet LOCATION '${NEGTMP}/neg_dvt';
DROP VIEW graft_tmp.neg_dvt;
