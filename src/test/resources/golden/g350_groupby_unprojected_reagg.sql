-- cbo_gby.q shape: GROUP BY includes unprojected columns; outer query
-- re-aggregates by the inner aliases
SELECT x, y, count(*) AS c FROM (
  SELECT n_name AS key, (n_regionkey + n_nationkey + 1 + 2) AS x, sum(n_nationkey) AS y
  FROM nation GROUP BY n_regionkey, n_nationkey, n_name) r
GROUP BY y, x
