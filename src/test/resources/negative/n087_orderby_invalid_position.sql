-- reference: ql/src/test/queries/clientnegative/orderby_invalid_position.q
-- ORDER BY ordinal out of the select-list range
-- ERROR-CONTAINS: ORDER_BY_POS_OUT_OF_RANGE | position 3
SELECT n_name, n_nationkey FROM nation ORDER BY 3 LIMIT 5;
