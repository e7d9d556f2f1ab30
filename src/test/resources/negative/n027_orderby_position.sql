-- reference: ql/src/test/queries/clientnegative/orderbysortby.q (ordinal family)
-- ORDER BY ordinal out of range
-- ERROR-CONTAINS: ORDER_BY_POS_OUT_OF_RANGE | position 5 | out of range
SELECT n_nationkey, n_name FROM nation ORDER BY 5;
