-- correlationoptimizer1.q (second half): GroupBy keyed on the LEFT side
-- of a LEFT SEMI JOIN shares the shuffle with the join.
set hive.optimize.correlation=true;
SELECT SUM(HASH(tmp.ck)) AS hk, SUM(HASH(tmp.cnt)) AS hc
FROM (SELECT c.c_custkey AS ck, count(1) AS cnt
      FROM customer c LEFT SEMI JOIN orders o ON (c.c_custkey = o.o_custkey)
      GROUP BY c.c_custkey) tmp;
