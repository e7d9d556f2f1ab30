-- correlationoptimizer9.q: two differently-filtered group-bys over the
-- SAME materialized tmp table, joined on the grouped key.
DROP TABLE IF EXISTS g763_tmp;
CREATE TABLE g763_tmp (c1 INT, c2 INT, c3 STRING, c4 STRING);
INSERT OVERWRITE TABLE g763_tmp
SELECT x.o_custkey, y.o_custkey, x.o_orderstatus, y.o_orderpriority
FROM orders x JOIN orders y ON x.o_orderkey = y.o_orderkey;
SELECT xx.key, yy.key AS key2, xx.cnt, yy.cnt AS cnt2
FROM (SELECT x.c1 AS key, count(1) AS cnt FROM g763_tmp x WHERE x.c1 < 120 GROUP BY x.c1) xx
JOIN (SELECT x1.c2 AS key, count(1) AS cnt FROM g763_tmp x1 WHERE x1.c2 > 100 GROUP BY x1.c2) yy
ON xx.key = yy.key
