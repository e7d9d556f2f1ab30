-- groupby_grouping_sets6.q shape: outer filter over a grouping-sets
-- subquery must keep the rollup rows of the matching key
SELECT a, b FROM (
  SELECT n_regionkey AS a, n_name AS b FROM nation
  GROUP BY n_regionkey, n_name GROUPING SETS ((n_regionkey, n_name), n_regionkey)
) res
WHERE res.a = 2
