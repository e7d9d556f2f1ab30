-- reference: ql/src/test/queries/clientnegative/udf_qualified_name.q
-- (udf argument-validation family): rand() seed must be a constant
-- ERROR-CONTAINS: SEED_EXPRESSION_IS_UNFOLDABLE | must be
SELECT rand(n_nationkey) FROM nation;
