-- exim_21_export_authsuccess.q + exim_22_import_exist_authsuccess.q:
-- under enforcement, EXPORT succeeds WITH a Select grant (it reads the
-- whole table — n-family negatives pin the ungranted refusal) and
-- IMPORT into an existing empty table succeeds with full privileges.
DROP TABLE IF EXISTS g907_dept;
CREATE TABLE g907_dept (dep_id INT) USING parquet;
INSERT INTO g907_dept VALUES (10), (20);
set hive.security.authorization.enabled=true;
GRANT SELECT ON TABLE g907_dept TO ROLE public;
EXPORT TABLE g907_dept TO '/tmp/graft_g907_exp';
REVOKE SELECT ON TABLE g907_dept FROM ROLE public;
set hive.security.authorization.enabled=false;
DROP TABLE g907_dept;
CREATE TABLE g907_dept (dep_id INT) USING parquet;
IMPORT TABLE g907_dept FROM '/tmp/graft_g907_exp';
SELECT dep_id FROM g907_dept ORDER BY dep_id
