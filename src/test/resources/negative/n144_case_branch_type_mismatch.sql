-- reference: ql/src/test/queries/clientnegative/invalid_arithmetic_type.q
-- (expression-typing family): CASE branches of irreconcilable types
-- ERROR-CONTAINS: DATA_DIFF_TYPES | data type mismatch
SELECT CASE WHEN n_regionkey > 1 THEN 1 ELSE array(1) END FROM nation;
