-- reference: ql/src/test/queries/clientnegative/authorization_droppartition.q
-- — partition DDL on a table needs an Alter-level grant under
-- enforcement (table-granularity here; the reference checks the
-- partition object).
-- ERROR-CONTAINS: No privilege 'Alter' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_auth_dp;
CREATE TABLE graft_tmp.neg_auth_dp (k INT, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO graft_tmp.neg_auth_dp PARTITION (ds='d1') VALUES (1);
set hive.security.authorization.enabled=true;
ALTER TABLE graft_tmp.neg_auth_dp DROP PARTITION (ds='d1');
