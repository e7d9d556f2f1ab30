-- correlationoptimizer1.q (different-key leg): GroupBy key differs from
-- the join key — the reference must NOT merge the shuffles; either way
-- the results are identical, which is the pinned contract.
set hive.optimize.correlation=true;
SELECT SUM(HASH(tmp.ok)) AS hk, SUM(HASH(tmp.cnt)) AS hc
FROM (SELECT o.o_orderkey AS ok, count(1) AS cnt
      FROM customer c JOIN orders o ON (c.c_custkey = o.o_custkey)
      GROUP BY o.o_orderkey) tmp;
