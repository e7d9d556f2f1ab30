-- reference: ql/src/test/queries/clientnegative/create_view_failure3.q
-- — the explicit view column list must match the SELECT's width.
-- ERROR-CONTAINS: number of columns | not enough data columns | does not match
CREATE VIEW neg338_v (x, y, z) AS SELECT n_nationkey FROM nation;
