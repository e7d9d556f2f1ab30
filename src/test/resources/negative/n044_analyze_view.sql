-- reference: ql/src/test/queries/clientnegative/analyze_view.q
-- ANALYZE TABLE on a view is refused
-- ERROR-CONTAINS: ANALYZE | view | EXPECT_TABLE
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_av;
CREATE VIEW graft_tmp.neg_av AS SELECT 1 AS k;
ANALYZE TABLE graft_tmp.neg_av COMPUTE STATISTICS;
