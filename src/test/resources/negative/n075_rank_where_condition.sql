-- reference: ql/src/test/queries/clientnegative/ptf_negative_WhereWithRankCond.q
-- a window function may not appear in WHERE
-- ERROR-CONTAINS: not allowed to use a window function | WHERE | INVALID_WHERE_CONDITION
SELECT n_name FROM nation WHERE rank() OVER (ORDER BY n_nationkey) < 3;
