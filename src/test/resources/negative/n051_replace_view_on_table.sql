-- reference: ql/src/test/queries/clientnegative/create_or_replace_view1.q
-- CREATE OR REPLACE VIEW over an existing TABLE is refused
-- ERROR-CONTAINS: EXPECT_VIEW_NOT_TABLE | is a table | not a view
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_rvt;
CREATE TABLE graft_tmp.neg_rvt (a INT) USING parquet LOCATION '${NEGTMP}/neg_rvt';
CREATE OR REPLACE VIEW graft_tmp.neg_rvt AS SELECT 1 AS k;
