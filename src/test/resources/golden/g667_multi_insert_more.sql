-- multi_insert.q, multi_insert_move_tasks_share_dependencies.q,
-- ppd_multi_insert.q: overlapping-predicate destinations (one row can
-- land in BOTH), an aggregate destination next to a row destination,
-- and pushdown into the shared source.
DROP TABLE IF EXISTS g667_lo;
DROP TABLE IF EXISTS g667_hi;
DROP TABLE IF EXISTS g667_agg;
CREATE TABLE g667_lo (k INT) USING parquet;
CREATE TABLE g667_hi (k INT) USING parquet;
CREATE TABLE g667_agg (r INT, n BIGINT) USING parquet;
FROM (SELECT * FROM nation WHERE n_nationkey < 20) src
INSERT OVERWRITE TABLE g667_lo SELECT n_nationkey WHERE n_nationkey < 12
INSERT OVERWRITE TABLE g667_hi SELECT n_nationkey WHERE n_nationkey > 8
INSERT OVERWRITE TABLE g667_agg SELECT n_regionkey, COUNT(*) GROUP BY n_regionkey;
SELECT 'lo' AS tag, COUNT(*) AS n, SUM(k) AS s FROM g667_lo
UNION ALL SELECT 'hi', COUNT(*), SUM(k) FROM g667_hi
UNION ALL SELECT 'overlap', COUNT(*), SUM(a.k) FROM g667_lo a JOIN g667_hi b ON a.k = b.k
UNION ALL SELECT 'agg', COUNT(*), SUM(n) FROM g667_agg
