-- reference: ql/src/test/queries/clientnegative/recursive_view.q
-- redefining a view in terms of a view that (transitively) reads it
-- creates a cycle and is refused.
-- ERROR-CONTAINS: RECURSIVE_VIEW | recursive view | cyclic
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP VIEW IF EXISTS graft_tmp.neg_rv1;
DROP VIEW IF EXISTS graft_tmp.neg_rv0;
DROP TABLE IF EXISTS graft_tmp.neg_rvt;
CREATE TABLE graft_tmp.neg_rvt (id INT) USING parquet;
CREATE VIEW graft_tmp.neg_rv0 AS SELECT * FROM graft_tmp.neg_rvt;
CREATE VIEW graft_tmp.neg_rv1 AS SELECT * FROM graft_tmp.neg_rv0;
CREATE OR REPLACE VIEW graft_tmp.neg_rv0 AS SELECT * FROM graft_tmp.neg_rv1;
