-- udf_case_column_pruning.q: CASE over the join key aliased AS the same
-- name (`key`) with ORDER BY + LIMIT — column pruning must keep only
-- a.key/b.key on the scans and the alias must not collide.
SELECT CASE a.n_nationkey
        WHEN 1 THEN 2
        WHEN 3 THEN 4
        ELSE 5
       END AS key
FROM nation a JOIN nation b
ON a.n_nationkey = b.n_nationkey
ORDER BY key LIMIT 10
