-- reference: ql/src/test/queries/clientnegative/compare_string_bigint.q
-- (ExprNodeGenericFuncDesc.java:215-221, ErrorMsg 10123): strict mode
-- refuses bigint-vs-string comparison — both sides coerce to double,
-- which rounds longs beyond 2^53
-- ERROR-CONTAINS: comparing bigints and strings is not allowed
SET hive.mapred.mode=strict;
SELECT * FROM orders WHERE CAST(1 AS BIGINT) = '1' LIMIT 10;
