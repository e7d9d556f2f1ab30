-- auto_join30.q/31.q: joins whose inputs are ORDER BY / SORT BY
-- subqueries — the sort below a join is semantically a no-op and the
-- result must match the unsorted join.
SELECT round(sum(hash_v) * 1) AS checksum
FROM (
  SELECT hash(x.n_name) + hash(y.n_name) AS hash_v
  FROM (SELECT * FROM nation ORDER BY n_name) x
  JOIN (SELECT * FROM nation SORT BY n_nationkey) y
    ON x.n_nationkey = y.n_nationkey
) t
