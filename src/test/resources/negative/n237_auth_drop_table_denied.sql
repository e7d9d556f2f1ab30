-- reference: ql/src/test/queries/clientnegative/authorization_not_owner_drop_tab.q
-- DROP TABLE under enforcement needs a Drop grant reaching the user
-- (legacy model: no implicit owner-gets-all).
-- ERROR-CONTAINS: No privilege 'Drop' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_droptab;
CREATE TABLE graft_tmp.neg_droptab (i INT) USING parquet;
set hive.security.authorization.enabled=true;
DROP TABLE graft_tmp.neg_droptab;
