-- correlationoptimizer2.q: two aggregated subqueries joined on their
-- group keys — three shuffles share one key.
set hive.optimize.correlation=true;
SELECT SUM(HASH(a.ck)) AS hk, SUM(HASH(a.cnt)) AS hca, SUM(HASH(b.cnt)) AS hcb
FROM (SELECT o_custkey AS ck, count(1) AS cnt FROM orders GROUP BY o_custkey) a
JOIN (SELECT c_custkey AS ck, count(1) AS cnt FROM customer GROUP BY c_custkey) b
ON a.ck = b.ck;
