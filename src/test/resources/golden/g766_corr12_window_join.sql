-- correlationoptimizer12.q: per-key windowed counts computed on EACH
-- side of a join independently (count OVER (PARTITION BY key)).
SELECT xx.key, xx.cnt, yy.key AS key2, yy.cnt AS cnt2
FROM (SELECT x.c_nationkey AS key, count(x.c_name) OVER (PARTITION BY x.c_nationkey) AS cnt
      FROM customer x) xx
JOIN (SELECT y.n_nationkey AS key, count(y.n_name) OVER (PARTITION BY y.n_nationkey) AS cnt
      FROM nation y) yy
ON xx.key = yy.key
WHERE xx.key < 5
