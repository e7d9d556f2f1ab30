-- reference: ql/src/test/queries/clientnegative/groupby_invalid_position.q
-- GROUP BY ordinal out of the select-list range
-- ERROR-CONTAINS: GROUP_BY_POS_OUT_OF_RANGE | position 3
SELECT n_regionkey, count(1) FROM nation GROUP BY 3;
