-- reference: ql/src/test/queries/clientnegative/insert_view_failure.q
-- ERROR-CONTAINS: EXPECT_TABLE_NOT_VIEW | into a view | UNSUPPORTED_INSERT
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_insview;
CREATE VIEW graft_tmp.neg_insview AS SELECT 1 AS k;
INSERT INTO graft_tmp.neg_insview VALUES (1);
