-- reference: ql/src/test/queries/clientnegative/subquery_scalar_multiple_rows.q
-- a scalar subquery returning more than one row fails at runtime
-- ERROR-CONTAINS: SCALAR_SUBQUERY_TOO_MANY_ROWS | more than one row
SELECT (SELECT n_nationkey FROM nation) AS one;
