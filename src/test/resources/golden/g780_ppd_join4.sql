-- ppd_join4.q: predicate over a sorted subquery feeding a join — the
-- WHERE t2.name='c' filter must apply (empty result), not be lost or
-- pushed past the sort incorrectly.
DROP TABLE IF EXISTS g780_t;
CREATE TABLE g780_t (id STRING, name STRING);
INSERT INTO g780_t VALUES ('a', 'b');
SELECT t2.id, t2.name
FROM (SELECT id, name FROM (SELECT id, name FROM g780_t) t1 SORT BY id) t2
JOIN g780_t t3 ON t2.id = t3.id
WHERE t2.name = 'c' AND t3.id = 'a'
