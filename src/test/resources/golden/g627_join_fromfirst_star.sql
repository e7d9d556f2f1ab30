-- join17.q / join22.q / join23.q: FROM-first INSERT of the full joined
-- star (src1.*, src2.*), nested subquery joins, and the WHERE-only
-- cartesian (join23: JOIN with no ON + WHERE filters on both sides).
DROP TABLE IF EXISTS g627_d;
CREATE TABLE g627_d (key1 INT, value1 STRING, key2 INT, value2 STRING) USING parquet;
FROM nation src1 JOIN nation src2 ON (src1.n_nationkey = src2.n_nationkey)
INSERT OVERWRITE TABLE g627_d
SELECT src1.n_nationkey, src1.n_name, src2.n_nationkey, src2.n_name;
SELECT 'star_insert' AS tag, COUNT(*) AS n, SUM(key1 + key2) AS s FROM g627_d
UNION ALL
SELECT 'nested_subq', COUNT(*), SUM(k) FROM
  (SELECT a.n_nationkey AS k FROM
    (SELECT * FROM nation WHERE n_regionkey < 3) a
    JOIN (SELECT * FROM nation WHERE n_regionkey > 0) b
    ON a.n_nationkey = b.n_nationkey) q
UNION ALL
SELECT 'cartesian_where', COUNT(*), SUM(src1.n_nationkey)
FROM nation src1 JOIN nation src2
WHERE src1.n_nationkey < 5 AND src2.n_nationkey < 5
