-- correlationoptimizer8.q-shape: self-join of one aggregated relation
-- on the group key (the classic shared-shuffle diamond).
set hive.optimize.correlation=true;
SELECT SUM(HASH(a.sk)) AS hk, SUM(HASH(b.cnt)) AS hc
FROM (SELECT l_suppkey AS sk, count(1) AS cnt FROM lineitem GROUP BY l_suppkey) a
JOIN (SELECT l_suppkey AS sk, count(1) AS cnt FROM lineitem GROUP BY l_suppkey) b
ON a.sk = b.sk;
