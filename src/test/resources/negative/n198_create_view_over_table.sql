-- reference: ql/src/test/queries/clientnegative/create_view_failure1.q —
-- CREATE VIEW under a name an existing TABLE holds is refused.
-- ERROR-CONTAINS: already exists
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_cv1;
CREATE TABLE graft_tmp.neg_cv1 (k INT) USING parquet;
CREATE VIEW graft_tmp.neg_cv1 AS SELECT 1 AS one;
