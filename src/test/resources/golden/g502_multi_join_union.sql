-- multi_join_union.q: a join whose two sides are each UNION ALL
-- subqueries of joins.
SELECT l.k AS k, l.nm AS left_nm, r.nm AS right_nm
FROM (
  SELECT n.n_nationkey AS k, r.r_name AS nm
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
  UNION ALL
  SELECT n.n_nationkey, n.n_name
  FROM nation n JOIN region r2 ON n.n_regionkey = r2.r_regionkey
  WHERE n.n_nationkey < 5
) l
JOIN (
  SELECT s.s_nationkey AS k, min(s.s_name) AS nm
  FROM supplier s JOIN nation n3 ON s.s_nationkey = n3.n_nationkey
  GROUP BY s.s_nationkey
) r ON l.k = r.k
WHERE l.k < 8
