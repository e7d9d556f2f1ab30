-- cbo_gby_empty.q: aggregates WITHOUT group-by wrapped in subqueries — a
-- constant key over a global aggregate, a UNION ALL of max/min/avg single
-- rows re-aggregated, and the empty-input edge (global aggregate over an
-- always-false scan still yields one row; grouped aggregate yields none).
SELECT 'const_key' AS tag, u.key AS k, CAST(u.value AS STRING) AS v
FROM (SELECT 'tst1' AS key, count(1) AS value FROM nation) u
UNION ALL
SELECT 'stats', u.key, CAST(u.value AS STRING)
FROM (SELECT 'max' AS key, max(n_nationkey) AS value FROM nation
      UNION ALL
      SELECT 'min' AS key, min(n_nationkey) AS value FROM nation
      UNION ALL
      SELECT 'avg' AS key, avg(n_nationkey) AS value FROM nation) u
UNION ALL
SELECT 'regrouped', u.key, CAST(count(1) AS STRING)
FROM (SELECT 'max' AS key, max(n_nationkey) AS value FROM nation
      UNION ALL
      SELECT 'min' AS key, min(n_nationkey) AS value FROM nation) u
GROUP BY u.key
UNION ALL
SELECT 'empty_global', 'cnt', CAST(count(1) AS STRING)
FROM (SELECT * FROM nation WHERE 1 = 0) e
UNION ALL
SELECT 'empty_grouped', n_name, CAST(count(1) AS STRING)
FROM (SELECT * FROM nation WHERE 1 = 0) e
GROUP BY n_name
