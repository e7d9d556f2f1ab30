-- correlationoptimizer13.q: two-key group-bys with DIFFERENT filters
-- over the same tmp, joined on both keys (grouping order differs from
-- join-key order — the reference checks the correlation still holds).
DROP TABLE IF EXISTS g767_tmp;
CREATE TABLE g767_tmp (c1 INT, c2 INT, c3 STRING, c4 STRING);
INSERT OVERWRITE TABLE g767_tmp
SELECT x.o_custkey, y.o_custkey, x.o_orderstatus, y.o_orderpriority
FROM orders x JOIN orders y ON x.o_orderkey = y.o_orderkey;
SELECT xx.key1, xx.key2, yy.key1 AS yk1, yy.key2 AS yk2, xx.cnt, yy.cnt AS cnt2
FROM (SELECT x.c1 AS key1, x.c3 AS key2, count(1) AS cnt FROM g767_tmp x WHERE x.c1 < 120 GROUP BY x.c3, x.c1) xx
JOIN (SELECT x1.c1 AS key1, x1.c3 AS key2, count(1) AS cnt FROM g767_tmp x1 WHERE x1.c2 > 100 GROUP BY x1.c3, x1.c1) yy
ON xx.key1 = yy.key1 AND xx.key2 = yy.key2
ORDER BY xx.key1, xx.key2
