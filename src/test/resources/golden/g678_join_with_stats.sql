-- auto_join_stats.q, auto_join_stats2.q, auto_join_without_localtask.q,
-- auto_smb_mapjoin_14.q, auto_sortmerge_join_15.q,
-- auto_sortmerge_join_16.q, alter_merge_stats_orc.q: ANALYZE both sides
-- (basic + column stats) then join — statistics steer the planner
-- (CBO), never the answers; ORC side concatenated after stats.
DROP TABLE IF EXISTS g678_a;
DROP TABLE IF EXISTS g678_b;
CREATE TABLE g678_a USING parquet AS SELECT n_nationkey AS k, n_regionkey AS r FROM nation;
CREATE TABLE g678_b USING orc AS SELECT r_regionkey AS r, r_name FROM region;
ANALYZE TABLE g678_a COMPUTE STATISTICS;
ANALYZE TABLE g678_b COMPUTE STATISTICS;
ANALYZE TABLE g678_a COMPUTE STATISTICS FOR COLUMNS k, r;
ANALYZE TABLE g678_b COMPUTE STATISTICS FOR COLUMNS r;
ALTER TABLE g678_b CONCATENATE;
SELECT b.r_name AS region, COUNT(*) AS n, SUM(a.k) AS s
FROM g678_a a JOIN g678_b b ON a.r = b.r
GROUP BY b.r_name
