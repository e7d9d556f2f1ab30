-- vector_groupby_reduce.q: group-by over a pre-aggregated subquery
-- (the reduce-side re-group shape) — first group collapses duplicates,
-- outer group re-aggregates the distinct keys.
SELECT l_returnflag,
       count(*) AS n_keys,
       sum(total_qty) AS qty
FROM (
  SELECT l_returnflag, l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_returnflag, l_orderkey
) t
GROUP BY l_returnflag
ORDER BY l_returnflag
