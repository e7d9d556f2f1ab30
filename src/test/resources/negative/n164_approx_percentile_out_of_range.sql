-- reference: ql/src/test/queries/clientnegative/invalid_avg_syntax.q
-- (aggregate argument-validation family): approx_percentile outside [0,1]
-- ERROR-CONTAINS: VALUE_OUT_OF_RANGE | data type mismatch
SELECT approx_percentile(n_regionkey, 2.0) FROM nation;
