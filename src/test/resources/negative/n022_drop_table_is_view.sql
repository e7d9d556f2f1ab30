-- reference: ql/src/test/queries/clientnegative/drop_table_failure2.q
-- DROP TABLE on a VIEW is refused
-- ERROR-CONTAINS: WRONG_COMMAND_FOR_OBJECT_TYPE | Cannot drop a view | is a view
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_dtv;
CREATE VIEW graft_tmp.neg_dtv AS SELECT 1 AS k;
DROP TABLE graft_tmp.neg_dtv;
