-- join29.q / join30.q / join33.q / join35.q: joins where one or both
-- sides are GROUPED subqueries (cnt columns), incl. the union-all-of-
-- group-bys side from join35.
SELECT 'both_grouped' AS tag, COUNT(*) AS n, SUM(s1.cnt + s2.cnt) AS s FROM
  (SELECT n_regionkey AS k, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey) s1
  JOIN (SELECT r_regionkey AS k, COUNT(*) AS cnt FROM region GROUP BY r_regionkey) s2
  ON s1.k = s2.k
UNION ALL
SELECT 'one_grouped', COUNT(*), SUM(s1.cnt) FROM
  (SELECT n_regionkey AS k, COUNT(*) AS cnt FROM nation GROUP BY n_regionkey) s1
  JOIN region r ON s1.k = r.r_regionkey
UNION ALL
SELECT 'union_side_join35', COUNT(*), SUM(subq1.cnt) FROM
  (SELECT n_nationkey AS key, COUNT(*) AS cnt FROM nation WHERE n_nationkey < 10 GROUP BY n_nationkey
   UNION ALL
   SELECT n_nationkey AS key, COUNT(*) AS cnt FROM nation WHERE n_nationkey > 20 GROUP BY n_nationkey) subq1
  JOIN nation x ON x.n_nationkey = subq1.key
