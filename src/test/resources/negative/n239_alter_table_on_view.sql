-- reference: ql/src/test/queries/clientnegative/alter_view_failure2.q
-- ALTER TABLE ... ADD PARTITION against a VIEW is refused — views take
-- ALTER VIEW, not ALTER TABLE.
-- ERROR-CONTAINS: is a view | expects a table | EXPECT_TABLE_NOT_VIEW
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_viewalter;
DROP TABLE IF EXISTS graft_tmp.neg_viewalter_t;
CREATE TABLE graft_tmp.neg_viewalter_t (key INT, value STRING) USING parquet;
CREATE VIEW graft_tmp.neg_viewalter AS
  SELECT key, value FROM graft_tmp.neg_viewalter_t;
ALTER TABLE graft_tmp.neg_viewalter ADD PARTITION (value='val_86');
