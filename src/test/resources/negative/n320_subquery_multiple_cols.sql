-- reference: ql/src/test/queries/clientnegative/
-- subquery_multiple_cols_in_select.q — an IN subquery whose select list
-- has more than one item refuses (SemanticAnalyzer Error 10250
-- "SubQuery can contain only 1 item in Select List").
-- ERROR-CONTAINS: only 1 item | num_columns_mismatch | number of columns
SELECT * FROM nation
WHERE n_nationkey IN (SELECT * FROM region r WHERE r.r_regionkey > 1);
