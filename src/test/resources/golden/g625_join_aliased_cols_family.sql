-- join9.q / join10.q / join11.q: joins over subqueries that re-alias
-- columns, with mixed qualified/aliased projections.
SELECT 'aliased' AS tag, COUNT(*) AS n, SUM(src1.c1) AS s FROM
  (SELECT n_nationkey AS c1, n_regionkey AS c2 FROM nation) src1
  JOIN (SELECT n_nationkey AS c3, n_name AS c4 FROM nation) src2
  ON (src1.c1 = src2.c3)
UNION ALL
SELECT 'requalified', COUNT(*), SUM(x.rk) FROM
  (SELECT n_regionkey AS rk, COUNT(*) AS c FROM nation GROUP BY n_regionkey) x
  JOIN region r ON (x.rk = r.r_regionkey)
