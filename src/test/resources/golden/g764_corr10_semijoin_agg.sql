-- correlationoptimizer10.q: agg-over-self-join LEFT SEMI JOINed against
-- a bigger table on the same key, plus the reverse semi-join shape.
SELECT xx.key, xx.cnt
FROM (SELECT x.n_nationkey AS key, count(1) AS cnt
      FROM nation x JOIN nation y ON x.n_nationkey = y.n_nationkey
      GROUP BY x.n_nationkey) xx
LEFT SEMI JOIN customer yy ON xx.key = yy.c_nationkey
UNION ALL
SELECT xx.n_nationkey, 1
FROM nation xx
LEFT SEMI JOIN (SELECT c_nationkey AS key FROM customer WHERE c_acctbal > 0) s
ON xx.n_nationkey = s.key AND xx.n_nationkey < 5
