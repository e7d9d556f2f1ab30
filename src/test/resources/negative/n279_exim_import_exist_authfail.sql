-- reference: ql/src/test/queries/clientnegative/exim_23_import_exist_authfail.q
-- IMPORT into an EXISTING table alters it: under enforcement it needs an
-- Alter grant on the destination ("No privilege 'Alter' found for
-- outputs" in the reference's .q.out).
-- ERROR-CONTAINS: No privilege 'Alter' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exim23;
DROP TABLE IF EXISTS graft_tmp.neg_exim23_i;
CREATE TABLE graft_tmp.neg_exim23 (dep_id INT) USING parquet;
INSERT INTO graft_tmp.neg_exim23 VALUES (1);
EXPORT TABLE graft_tmp.neg_exim23 TO '${NEGTMP}/exp23';
CREATE TABLE graft_tmp.neg_exim23_i (dep_id INT) USING parquet;
set hive.security.authorization.enabled=true;
IMPORT TABLE graft_tmp.neg_exim23_i FROM '${NEGTMP}/exp23';
