-- correlationoptimizer5.q: a join of two join-subqueries all on the same
-- key (one shared shuffle in the reference's correlation optimizer),
-- INSERT OVERWRITE twice into the sink, hashed readback.
DROP TABLE IF EXISTS g761_dest;
CREATE TABLE g761_dest (key INT, val STRING);
INSERT OVERWRITE TABLE g761_dest
SELECT b.key, d.val
FROM (SELECT x.c_custkey AS key, x.c_name AS val FROM customer x JOIN orders y ON x.c_custkey = y.o_custkey) b
JOIN (SELECT m.c_custkey AS key, m.c_mktsegment AS val FROM customer m JOIN orders n ON m.c_custkey = n.o_custkey) d
ON b.key = d.key;
INSERT OVERWRITE TABLE g761_dest
SELECT b.key, d.val
FROM (SELECT x.c_custkey AS key, x.c_name AS val FROM customer x JOIN orders y ON x.c_custkey = y.o_custkey) b
JOIN (SELECT m.c_custkey AS key, m.c_mktsegment AS val FROM customer m JOIN orders n ON m.c_custkey = n.o_custkey) d
ON b.key = d.key;
SELECT sum(hash(key)) AS hk, sum(hash(val)) AS hv, count(1) AS n FROM g761_dest
