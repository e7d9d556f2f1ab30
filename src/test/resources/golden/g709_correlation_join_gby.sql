-- clientpositive/correlationoptimizer1.q: a GroupBy following a Join on
-- the SAME key — the reference's Correlation Optimizer merges their
-- shuffles; Catalyst reuses the exchange the same way. The pinned
-- contract: identical results with the optimization toggled off and on
-- (the toggle is a bridged no-op conf here; the result is what matters).
set hive.auto.convert.join=false;
set hive.optimize.correlation=true;
SELECT SUM(HASH(tmp.ck)) AS hk, SUM(HASH(tmp.cnt)) AS hc
FROM (SELECT c.c_custkey AS ck, count(1) AS cnt
      FROM customer c JOIN orders o ON (c.c_custkey = o.o_custkey)
      GROUP BY c.c_custkey) tmp;
