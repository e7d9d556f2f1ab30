-- reference: ql/src/test/queries/clientnegative/udf_greatest_error_1.q
-- greatest over irreconcilable argument types
-- ERROR-CONTAINS: DATA_DIFF_TYPES | data type mismatch
SELECT greatest(1, array(2)) FROM nation;
