-- reference: ql/src/test/queries/clientnegative/udtf_explode_not_supported3.q
-- a generator is not allowed in the WHERE clause
-- ERROR-CONTAINS: UNSUPPORTED_GENERATOR | outside the SELECT
SELECT n_nationkey FROM nation WHERE explode(array(1,2)) = 1;
