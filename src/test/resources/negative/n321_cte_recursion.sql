-- reference: ql/src/test/queries/clientnegative/cte_recursion.q — a CTE
-- referencing a later CTE (q1 -> q2 -> q1 cycle) refuses: WITH is
-- non-recursive and resolves sequentially, so the forward reference
-- does not resolve.
-- ERROR-CONTAINS: q2 | recursive | not be found | not found
WITH q1 AS (SELECT n_nationkey AS key FROM q2 WHERE key = 5),
     q2 AS (SELECT key FROM q1 WHERE key = 5)
SELECT * FROM q1;
