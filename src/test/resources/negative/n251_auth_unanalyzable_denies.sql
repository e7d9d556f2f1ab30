-- reference: SemanticAnalyzer fails an unanalyzable statement BEFORE
-- any authorization decision — never around it. Closes the r14
-- fail-open's analysis-error branch: under enforcement, an UPDATE whose
-- WHERE subquery cannot be analyzed (nonexistent column in the other
-- table) must surface the analysis error from the enforcement walk, not
-- skip the subquery's Select checks and proceed to the DML rewrite.
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_ua_t;
DROP TABLE IF EXISTS graft_tmp.neg_ua_s;
CREATE TABLE graft_tmp.neg_ua_t (k INT, v STRING) USING parquet;
CREATE TABLE graft_tmp.neg_ua_s (k INT) USING parquet;
INSERT INTO graft_tmp.neg_ua_t VALUES (1, 'a');
INSERT INTO graft_tmp.neg_ua_s VALUES (1);
set hive.security.authorization.enabled=true;
GRANT ALL ON TABLE graft_tmp.neg_ua_t TO ROLE public;
GRANT SELECT ON TABLE graft_tmp.neg_ua_s TO ROLE public;
UPDATE graft_tmp.neg_ua_t SET v = 'x'
  WHERE k IN (SELECT no_such_col FROM graft_tmp.neg_ua_s);
