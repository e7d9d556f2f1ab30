-- subquery_in.q, lateral_view_explode2.q: IN-subquery with correlation
-- inside a derived table, and a double-explode lateral view (two
-- generators stacked).
SELECT 'in_subq_derived' AS tag, COUNT(*) AS n FROM
  (SELECT * FROM nation WHERE n_regionkey IN
     (SELECT r_regionkey FROM region WHERE r_regionkey < 3)) t
UNION ALL
SELECT 'double_explode', COUNT(*) FROM (
  SELECT a, b FROM (SELECT ARRAY(1, 2, 3) AS xs, ARRAY('p', 'q') AS ys) t
  LATERAL VIEW EXPLODE(xs) e1 AS a
  LATERAL VIEW EXPLODE(ys) e2 AS b) z
UNION ALL
SELECT 'corr_in', COUNT(*) FROM region r WHERE r_regionkey IN
  (SELECT n_regionkey FROM nation n WHERE n.n_nationkey > 4 * r.r_regionkey)
