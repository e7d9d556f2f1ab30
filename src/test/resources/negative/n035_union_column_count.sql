-- reference: ql/src/test/queries/clientnegative/union.q
-- both union legs must have the same number of columns
-- ERROR-CONTAINS: NUM_COLUMNS_MISMATCH | same number of columns
SELECT n_nationkey FROM nation UNION ALL SELECT n_nationkey, n_name FROM nation;
