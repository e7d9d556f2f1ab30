-- reference: ql/src/test/queries/clientnegative/compare_double_bigint.q
-- (ExprNodeGenericFuncDesc.java:222-229, ErrorMsg 10124): strict mode
-- refuses bigint-vs-double comparison (double compare rounds past 2^53)
-- ERROR-CONTAINS: comparing bigints and doubles is not allowed
SET hive.mapred.mode=strict;
SELECT * FROM orders WHERE o_orderkey = o_totalprice LIMIT 10;
