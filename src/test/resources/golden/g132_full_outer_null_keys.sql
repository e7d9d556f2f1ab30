WITH a AS (SELECT CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_nationkey END AS k FROM nation),
     b AS (SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END AS k FROM nation)
SELECT count(*) AS n_rows, count(a.k) AS n_ak, count(b.k) AS n_bk,
  sum(CASE WHEN a.k IS NULL AND b.k IS NULL THEN 1 ELSE 0 END) AS both_null
FROM a FULL OUTER JOIN b ON a.k = b.k
