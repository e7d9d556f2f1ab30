-- reference: ql/src/test/queries/clientnegative/subquery_missing_from.q
-- IN-subquery with no FROM: the inner column resolves against nothing
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT * FROM nation WHERE n_nationkey IN (SELECT n_missing);
