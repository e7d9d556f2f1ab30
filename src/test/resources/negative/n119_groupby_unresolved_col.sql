-- reference: ql/src/test/queries/clientnegative/groupby_key.q (resolution leg)
-- GROUP BY naming a column that exists nowhere
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT n_name FROM nation GROUP BY no_such_col;
