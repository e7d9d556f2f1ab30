-- reference: ql/src/test/queries/clientnegative/authorization_fail_3.q
-- a Create grant admits ADD PARTITION but does NOT cover reading the
-- table — the SELECT is refused.
-- ERROR-CONTAINS: No privilege 'Select' found
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_af3;
CREATE TABLE graft_tmp.neg_af3 (key INT, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
set hive.security.authorization.enabled=true;
GRANT CREATE ON TABLE graft_tmp.neg_af3 TO ROLE public;
ALTER TABLE graft_tmp.neg_af3 ADD PARTITION (ds='2010');
SELECT key FROM graft_tmp.neg_af3 WHERE ds='2010';
