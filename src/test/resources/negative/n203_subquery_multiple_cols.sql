-- reference: ql/src/test/queries/clientnegative/subquery_multiple_cols.q
-- — an IN predicate over a single expression cannot take a two-column
-- subquery.
-- ERROR-CONTAINS: NUM_COLUMNS_MISMATCH | must have the same number of columns | IN_SUBQUERY_LENGTH_MISMATCH
SELECT * FROM nation WHERE n_nationkey IN (SELECT n_nationkey, n_regionkey FROM nation);
