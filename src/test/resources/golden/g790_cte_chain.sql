-- cte_1.q: a WITH clause used directly, inside a subquery, and CHAINED
-- (one CTE defined in terms of another).
WITH q2 AS (SELECT n_nationkey AS key FROM nation WHERE n_nationkey < 10),
     q1 AS (SELECT key FROM q2 WHERE key > 4)
SELECT * FROM (SELECT key FROM q1) a
