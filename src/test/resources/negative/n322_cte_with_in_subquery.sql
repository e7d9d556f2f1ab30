-- reference: ql/src/test/queries/clientnegative/cte_with_in_subquery.q —
-- a CTE inside a derived table referencing an undefined table q2
-- refuses with table-not-found.
-- ERROR-CONTAINS: q2 | not be found | not found
SELECT * FROM (
  WITH q1 AS (SELECT n_nationkey AS key FROM q2 WHERE key = 5)
  SELECT * FROM q1) a;
