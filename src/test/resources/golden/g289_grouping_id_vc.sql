-- GROUPING__ID as a bare virtual column (groupby_cube1.q /
-- groupby_grouping_sets*.q spell it this way, not as a function call).
-- Post-HIVE-16102 bit order: leftmost GROUP BY column = most significant
-- bit, which is also Spark's grouping_id() convention.
SELECT n_regionkey, r_name, GROUPING__ID AS gid, count(*) AS cnt
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY n_regionkey, r_name WITH ROLLUP
ORDER BY gid, n_regionkey, r_name;
