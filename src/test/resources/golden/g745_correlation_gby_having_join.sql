-- correlationoptimizer15.q-shape: aggregated-with-HAVING subquery joined
-- back on the group key.
set hive.optimize.correlation=true;
SELECT SUM(HASH(a.ck)) AS hk, SUM(HASH(b.c_nationkey)) AS hn
FROM (SELECT o_custkey AS ck, count(1) AS cnt FROM orders
      GROUP BY o_custkey HAVING count(1) > 2) a
JOIN customer b ON a.ck = b.c_custkey;
