-- join40.q shape: LEFT OUTER JOIN against a LIMITed subquery — the limit
-- materializes before the join; unmatched left rows pad NULL.
SELECT a.n_nationkey AS ak, b.n_nationkey AS bk
FROM nation a
LEFT OUTER JOIN (
  SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5
) b ON a.n_nationkey = b.n_nationkey
