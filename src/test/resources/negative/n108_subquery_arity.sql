-- reference: ql/src/test/queries/clientnegative/subquery_multiple_cols_in_select.q
-- IN-subquery whose select list is wider than the lhs
-- ERROR-CONTAINS: IN_SUBQUERY_LENGTH_MISMATCH | number of columns in the left
SELECT * FROM nation WHERE n_nationkey IN (SELECT * FROM nation);
