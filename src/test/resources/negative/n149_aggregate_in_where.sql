-- reference: ql/src/test/queries/clientnegative/ptf_negative_WhereWithRankCond.q
-- (aggregate-in-WHERE leg): an aggregate function inside WHERE
-- ERROR-CONTAINS: INVALID_WHERE_CONDITION | invalid expressions
SELECT n_name FROM nation WHERE max(n_regionkey) > 2;
