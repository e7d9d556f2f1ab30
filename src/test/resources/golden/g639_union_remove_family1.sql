-- union_remove_4.q, union_remove_5.q, union_remove_7.q,
-- union_remove_8.q, union_remove_9.q: the union-removal
-- optimization family — INSERT of a UNION ALL whose branches are
-- map-only vs aggregate; the optimization must never change the rows
-- that land in the table.
DROP TABLE IF EXISTS g639_d;
CREATE TABLE g639_d (k STRING, cnt BIGINT) USING parquet;
INSERT OVERWRITE TABLE g639_d
SELECT n_name, COUNT(*) FROM nation WHERE n_regionkey = 0 GROUP BY n_name
UNION ALL
SELECT n_name, 1 FROM nation WHERE n_regionkey = 1;
SELECT COUNT(*) AS n, SUM(cnt) AS s, COUNT(DISTINCT k) AS dk FROM g639_d
