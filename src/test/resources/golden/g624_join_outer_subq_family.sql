-- join5.q / join6.q / join7.q / join8.q: outer joins of FILTERED
-- subqueries with partially-overlapping ranges — the null-extension
-- pattern battery (right outer, full outer, and the "both-null filter"
-- of join8).
SELECT 'right_outer' AS tag, COUNT(*) AS n,
       SUM(COALESCE(a.c1, -1)) AS sa, SUM(b.c3) AS sb FROM
  (SELECT n_nationkey AS c1, n_name AS c2 FROM nation WHERE n_nationkey > 10 AND n_nationkey < 20) a
  RIGHT OUTER JOIN
  (SELECT n_nationkey AS c3, n_name AS c4 FROM nation WHERE n_nationkey > 15 AND n_nationkey < 25) b
  ON (a.c1 = b.c3)
UNION ALL
SELECT 'full_outer', COUNT(*), SUM(COALESCE(a.c1, -1)), SUM(COALESCE(b.c3, -1)) FROM
  (SELECT n_nationkey AS c1 FROM nation WHERE n_nationkey > 10 AND n_nationkey < 20) a
  FULL OUTER JOIN
  (SELECT n_nationkey AS c3 FROM nation WHERE n_nationkey > 15 AND n_nationkey < 25) b
  ON (a.c1 = b.c3)
UNION ALL
SELECT 'join8_nullfilter', COUNT(*), SUM(a.c1), SUM(COALESCE(b.c3, -1)) FROM
  (SELECT n_nationkey AS c1 FROM nation WHERE n_nationkey > 10 AND n_nationkey < 20) a
  LEFT OUTER JOIN
  (SELECT n_nationkey AS c3 FROM nation WHERE n_nationkey > 15 AND n_nationkey < 25) b
  ON (a.c1 = b.c3)
  WHERE b.c3 IS NULL
