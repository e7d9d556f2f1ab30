WITH t AS (SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END AS k, n_name FROM nation)
SELECT 'eq' AS mode, count(*) AS n FROM t a JOIN t b ON a.k = b.k
UNION ALL
SELECT 'nullsafe' AS mode, count(*) AS n FROM t a JOIN t b ON a.k <=> b.k
