-- nullgroup2.q / nullgroup5.q: GROUP BY over a filter that matches
-- NOTHING must yield zero rows (not a null group), and a UNION ALL of an
-- empty-side scan with a populated one keeps only the populated rows.
SELECT u.key, count(1) AS n FROM (
  SELECT n_nationkey AS key FROM nation WHERE n_nationkey > 9999
  UNION ALL
  SELECT n_nationkey AS key FROM nation WHERE n_regionkey = 2
) u
GROUP BY u.key
