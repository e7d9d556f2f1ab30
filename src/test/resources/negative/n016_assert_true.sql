-- reference: ql/src/test/queries/clientnegative/udf_assert_true.q
-- ERROR-CONTAINS: is not true | ASSERT
SELECT assert_true(n_nationkey > 100) FROM nation LIMIT 1;
