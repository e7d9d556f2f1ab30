-- reference: ql/src/test/queries/clientnegative/authorization_fail_7.q
-- (privilege-kind shape) + ql/.../VirtualColumn.java reads.
-- Closes the r14 fail-open: a virtual-column SELECT fails Spark
-- analysis AS WRITTEN, so the pre-r15 authorization walk swallowed the
-- analysis error and skipped its Select checks — the rewrite path then
-- served the rows, letting an ungranted user exfiltrate any table just
-- by mentioning INPUT__FILE__NAME. The walk now retries the analysis
-- through the engine's own dialect rewrites, sees the read entity, and
-- denies.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_vc_read;
CREATE TABLE graft_tmp.neg_vc_read (key INT, value STRING) USING parquet;
INSERT INTO graft_tmp.neg_vc_read VALUES (1, 'secret');
set hive.security.authorization.enabled=true;
SELECT INPUT__FILE__NAME, value FROM graft_tmp.neg_vc_read;
