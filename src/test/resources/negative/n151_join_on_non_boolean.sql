-- reference: ql/src/test/queries/clientnegative/udf_when_type_wrong.q
-- (boolean-context family): a non-boolean join condition
-- ERROR-CONTAINS: JOIN_CONDITION_IS_NOT_BOOLEAN_TYPE | expected "BOOLEAN"
SELECT a.n_name FROM nation a JOIN region b ON 5;
