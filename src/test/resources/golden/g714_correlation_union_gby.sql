-- correlationoptimizer6.q-shape: UNION ALL of two aggregates regrouped
-- on the shared key.
set hive.optimize.correlation=true;
SELECT u.ck AS ck, sum(u.cnt) AS total
FROM (SELECT o_custkey AS ck, count(1) AS cnt FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT c_custkey AS ck, count(1) AS cnt FROM customer GROUP BY c_custkey) u
GROUP BY u.ck
ORDER BY total DESC, ck LIMIT 10;
