-- correlationoptimizer4.q: LEFT OUTER / RIGHT OUTER join under the same
-- group key — the null-extended rows must flow into the aggregate.
set hive.optimize.correlation=true;
SELECT SUM(HASH(tmp.ck)) AS hk, SUM(HASH(tmp.cnt)) AS hc
FROM (SELECT y.o_custkey AS ck, count(1) AS cnt
      FROM customer x RIGHT OUTER JOIN orders y ON (x.c_custkey = y.o_custkey)
      GROUP BY y.o_custkey) tmp;
