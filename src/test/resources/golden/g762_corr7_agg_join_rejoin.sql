-- correlationoptimizer7.q: aggregate over a join, then join the result
-- back to the small side on the same key (the reference runs it with
-- the optimizer on and off and with a mapjoin hint — same rows).
SELECT xx.key, xx.cnt, yy.n_name
FROM (SELECT x.c_nationkey AS key, count(1) AS cnt
      FROM customer x JOIN nation y ON x.c_nationkey = y.n_nationkey
      GROUP BY x.c_nationkey) xx
JOIN nation yy ON xx.key = yy.n_nationkey
