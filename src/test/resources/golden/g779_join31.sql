-- join31.q: join of two GROUP BY subqueries re-grouped on the join key
-- (three aggregations sharing one key — the correlation-optimizer
-- family's sibling), into a sink read back.
DROP TABLE IF EXISTS g779_dest;
CREATE TABLE g779_dest (key INT, cnt INT);
INSERT OVERWRITE TABLE g779_dest
SELECT subq1.key, count(1) AS cnt
FROM (SELECT c_nationkey AS key, count(1) AS cnt FROM customer GROUP BY c_nationkey) subq1
JOIN (SELECT n_nationkey AS key, count(1) AS cnt FROM nation GROUP BY n_nationkey) subq2
ON subq1.key = subq2.key
GROUP BY subq1.key;
SELECT key, cnt FROM g779_dest
