-- reference: ql/src/test/queries/clientnegative/udf_add_months_error_1.q
-- add_months over a boolean first argument
-- ERROR-CONTAINS: UNEXPECTED_INPUT_TYPE | data type mismatch
SELECT add_months(true, 1) FROM nation;
