-- join1.q / join2.q / join3.q: plain self equi-joins, 2-way and 3-way,
-- FROM-first INSERT of the joined projection.
DROP TABLE IF EXISTS g623_d;
CREATE TABLE g623_d (k INT, v STRING) USING parquet;
FROM nation a JOIN nation b ON (a.n_nationkey = b.n_nationkey)
INSERT OVERWRITE TABLE g623_d SELECT a.n_nationkey, b.n_name;
SELECT 'two_way' AS tag, COUNT(*) AS n, SUM(k) AS s FROM g623_d
UNION ALL
SELECT 'three_way', COUNT(*), SUM(a.n_nationkey)
FROM nation a JOIN nation b ON (a.n_nationkey = b.n_nationkey)
              JOIN nation c ON (b.n_nationkey = c.n_nationkey)
UNION ALL
SELECT 'key_plus', COUNT(*), SUM(b.n_nationkey)
FROM nation a JOIN nation b ON (a.n_nationkey + b.n_nationkey = 24)
