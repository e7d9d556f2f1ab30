-- correlationoptimizer3.q: a join feeding a join on the same key plus a
-- count(distinct) on top.
set hive.optimize.correlation=true;
SELECT SUM(HASH(tmp.ck)) AS hk, SUM(HASH(tmp.cnt)) AS hc
FROM (SELECT x.o_custkey AS ck, count(DISTINCT x.o_orderkey) AS cnt
      FROM orders x JOIN customer y ON (x.o_custkey = y.c_custkey)
      JOIN orders z ON (x.o_custkey = z.o_custkey)
      GROUP BY x.o_custkey) tmp;
