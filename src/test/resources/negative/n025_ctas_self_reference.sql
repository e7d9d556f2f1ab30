-- reference: ql/src/test/queries/clientnegative/cte_recursion.q
-- a CTE may not reference itself (no recursion)
-- ERROR-CONTAINS: TABLE_OR_VIEW_NOT_FOUND | cannot be found | recursi
WITH q1 AS (SELECT n_nationkey FROM q1) SELECT * FROM q1;
