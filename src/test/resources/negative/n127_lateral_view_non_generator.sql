-- reference: ql/src/test/queries/clientnegative/udtf_explode_not_supported1.q
-- (generator-validation family): LATERAL VIEW over a scalar function
-- ERROR-CONTAINS: NOT_GENERATOR | expected to be a generator
SELECT x FROM nation LATERAL VIEW upper(n_name) t AS x;
