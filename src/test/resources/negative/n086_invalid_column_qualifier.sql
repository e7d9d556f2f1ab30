-- reference: ql/src/test/queries/clientnegative/input2.q
-- a column under an undefined table alias
-- ERROR-CONTAINS: cannot be resolved | UNRESOLVED_COLUMN
SELECT a.n_name FROM nation;
