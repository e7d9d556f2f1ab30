-- reference: ql/src/test/queries/clientnegative/union2.q (set-operation
-- arity family; INTERSECT leg)
-- ERROR-CONTAINS: NUM_COLUMNS_MISMATCH | same number of columns
SELECT n_name FROM nation INTERSECT SELECT n_name, n_regionkey FROM nation;
