-- reference: ql/src/test/queries/clientnegative/create_view_failure6.q
-- PARTITIONED ON must name the view's RIGHTMOST output columns
-- (error 10093) — `baz` is not an output column at all here.
-- ERROR-CONTAINS: Rightmost columns in view output do not match
DROP VIEW IF EXISTS neg295_v;
CREATE VIEW neg295_v PARTITIONED ON (baz)
  AS SELECT n_name FROM nation;
