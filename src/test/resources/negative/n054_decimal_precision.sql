-- reference: ql/src/test/queries/clientnegative/decimal_precision.q
-- precision above the maximum (38) is refused
-- ERROR-CONTAINS: DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION | exceeds max precision | maximum
SELECT CAST(n_nationkey AS DECIMAL(99, 0)) FROM nation LIMIT 1;
