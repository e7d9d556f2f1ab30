-- reference: ql/src/test/queries/clientnegative/invalid_avg_syntax.q
-- (aggregate argument-validation family): percentile outside [0,1]
-- ERROR-CONTAINS: VALUE_OUT_OF_RANGE | data type mismatch
SELECT percentile(n_regionkey, 1.5) FROM nation;
