-- reference: ql/src/test/queries/clientnegative/groupby_grouping_id1.q
-- grouping()/GROUPING__ID outside a GROUP BY ... GROUPING SETS is refused
-- ERROR-CONTAINS: UNSUPPORTED_GROUPING_EXPRESSION | grouping
SELECT grouping(n_name) FROM nation;
