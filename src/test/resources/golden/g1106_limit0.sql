-- reference: ql/src/test/queries/clientpositive/limit0.q — LIMIT 0 on a
-- filter, an aggregate, and a nested limited subquery: zero rows, full
-- schema.
SELECT 'filter' AS tag, CAST(count(*) AS INT) AS n FROM
  (SELECT * FROM nation WHERE n_nationkey = 238 LIMIT 0) a
UNION ALL
SELECT 'groupby', CAST(count(*) AS INT) FROM
  (SELECT n_regionkey, count(n_name) FROM nation
   GROUP BY n_regionkey LIMIT 0) b
UNION ALL
SELECT 'nested', CAST(count(*) AS INT) FROM
  (SELECT * FROM (SELECT n_nationkey FROM nation LIMIT 3) sq1 LIMIT 0) c
