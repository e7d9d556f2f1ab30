-- reference: ql/src/test/queries/clientnegative/exim_22_export_authfail.q
-- EXPORT reads the table's full contents: under enforcement a user with
-- no Select grant is refused.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exim22;
CREATE TABLE graft_tmp.neg_exim22 (dep_id INT) USING parquet;
INSERT INTO graft_tmp.neg_exim22 VALUES (1);
set hive.security.authorization.enabled=true;
EXPORT TABLE graft_tmp.neg_exim22 TO '${NEGTMP}/exp22';
