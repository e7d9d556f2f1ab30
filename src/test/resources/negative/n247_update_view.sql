-- reference: ql/src/test/queries/clientnegative/view_update.q — DML
-- (UPDATE) against a VIEW is refused; only tables take writes.
-- ERROR-CONTAINS: is a view | expects a table | not supported | cannot be updated | UNSUPPORTED
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_updview;
DROP TABLE IF EXISTS graft_tmp.neg_updview_t;
CREATE TABLE graft_tmp.neg_updview_t (key INT, v STRING) USING parquet;
INSERT INTO graft_tmp.neg_updview_t VALUES (1, 'a');
CREATE VIEW graft_tmp.neg_updview AS
  SELECT key, v FROM graft_tmp.neg_updview_t;
UPDATE graft_tmp.neg_updview SET v = 'x' WHERE key = 1;
