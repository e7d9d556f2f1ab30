-- mixed DISTINCT and plain aggregates over the same column
SELECT l_returnflag,
  count(DISTINCT l_suppkey) AS d_supp, count(l_suppkey) AS n_supp,
  round(sum(DISTINCT l_quantity) * 100) / 100 AS d_qty_sum,
  round(sum(l_quantity) * 100) / 100 AS qty_sum
FROM lineitem GROUP BY l_returnflag
