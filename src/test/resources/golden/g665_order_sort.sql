-- order.q, sort.q, order2.q shape: full-table ORDER BY with expression
-- keys and a SORT BY whose per-partition order feeds a deterministic
-- aggregate (collect over sorted runs is canonicalized by row sort).
SELECT k, v FROM (
  SELECT n_nationkey AS k, n_name AS v FROM nation ORDER BY n_name DESC LIMIT 6) t
UNION ALL
SELECT -1 AS k, CONCAT_WS(',', SORT_ARRAY(COLLECT_LIST(n_name))) AS v
FROM (SELECT n_name FROM nation SORT BY n_name LIMIT 5) s
