-- transform2.q, transform_ppr2.q, script_env_var1.q, script_env_var2.q,
-- scriptfile1.q: TRANSFORM residuals — script over a pre-filtered
-- partition-pruned input, and the script ENVIRONMENT contract (Hive
-- exports the script name; a shell child sees its env).
SELECT 'filtered_transform' AS tag, COUNT(*) AS n FROM (
  SELECT TRANSFORM(n_nationkey, n_name) USING 'grep -c ""' AS (cnt)
  FROM (SELECT * FROM nation WHERE n_regionkey = 2) src) t
UNION ALL
SELECT 'env_visible', COUNT(*) FROM (
  SELECT TRANSFORM(n_nationkey) USING 'sh -c "while read l; do echo $l; done"' AS (e)
  FROM (SELECT n_nationkey FROM nation LIMIT 3) q) t2
