-- auto_join2.q, auto_join3.q, auto_join4.q, auto_join5.q,
-- auto_join6.q, auto_join7.q, auto_join8.q, auto_join9.q: the auto-converted (broadcast) twins of
-- the basic join battery — this engine always auto-converts eligible
-- sides, so the semantics pin is results identical to the reduce-side
-- forms: chained key arithmetic, outer + filter, grouped output.
SELECT 'aj2_chain' AS tag, COUNT(*) AS n, SUM(c.n_nationkey) AS s
FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
  JOIN nation c ON a.n_nationkey + b.n_nationkey = c.n_nationkey
UNION ALL
SELECT 'aj4_left_range', COUNT(*), SUM(COALESCE(b.n_nationkey, -1)) FROM
  (SELECT * FROM nation WHERE n_nationkey BETWEEN 5 AND 15) a
  LEFT OUTER JOIN
  (SELECT * FROM nation WHERE n_nationkey BETWEEN 10 AND 20) b
  ON a.n_nationkey = b.n_nationkey
UNION ALL
SELECT 'aj8_null_filtered', COUNT(*), SUM(a.n_nationkey) FROM
  (SELECT * FROM nation WHERE n_nationkey BETWEEN 5 AND 15) a
  LEFT OUTER JOIN
  (SELECT * FROM nation WHERE n_nationkey BETWEEN 10 AND 20) b
  ON a.n_nationkey = b.n_nationkey
  WHERE b.n_nationkey IS NULL
UNION ALL
SELECT 'aj9_grouped', COUNT(*), SUM(cnt) FROM
  (SELECT a.n_regionkey, COUNT(*) AS cnt
   FROM nation a JOIN region b ON a.n_regionkey = b.r_regionkey
   GROUP BY a.n_regionkey) g
