-- sequencefile append path under a join: two INSERT INTOs land separate
-- container files; the join reads across both.
DROP TABLE IF EXISTS g519_t;
CREATE TABLE g519_t (k INT, v STRING) STORED AS SEQUENCEFILE;
INSERT INTO g519_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10;
INSERT INTO g519_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 15;
SELECT t.k AS k, t.v AS v, r.r_name AS region
FROM g519_t t
JOIN nation n ON t.k = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE t.k % 3 = 0
