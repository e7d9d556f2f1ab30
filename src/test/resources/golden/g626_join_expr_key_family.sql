-- join13.q / join14.q / join15.q: expression join keys (sum of two
-- keys), range-filtered sides, sorted self-join output.
SELECT 'expr_key' AS tag, COUNT(*) AS n FROM
  nation src1 JOIN nation src2 ON (src1.n_nationkey = src2.n_nationkey)
  JOIN nation src3 ON (src1.n_nationkey + src2.n_nationkey = src3.n_nationkey)
UNION ALL
SELECT 'range_filtered', COUNT(*) FROM
  nation a JOIN region b ON (a.n_regionkey = b.r_regionkey)
  WHERE a.n_nationkey > 5
UNION ALL
SELECT 'self_sorted', COUNT(*) FROM
  (SELECT * FROM nation ORDER BY n_nationkey) a
  JOIN (SELECT * FROM nation ORDER BY n_name) b ON (a.n_nationkey = b.n_nationkey)
