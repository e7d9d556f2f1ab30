SELECT 'with_nulls' AS mode, count(*) AS n FROM nation
WHERE n_nationkey NOT IN (SELECT CASE WHEN r_regionkey = 3 THEN NULL ELSE r_regionkey END FROM region)
UNION ALL
SELECT 'no_nulls' AS mode, count(*) AS n FROM nation
WHERE n_nationkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey IS NOT NULL)
