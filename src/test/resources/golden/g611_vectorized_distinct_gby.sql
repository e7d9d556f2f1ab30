-- vectorized_distinct_gby.q: multiple DISTINCT aggregates in one
-- grouped SELECT (Hive rewrites via grouping-set expansion).
SELECT o_orderstatus,
  COUNT(DISTINCT o_orderpriority) AS d_prio,
  COUNT(DISTINCT YEAR(o_orderdate)) AS d_year,
  SUM(DISTINCT o_custkey % 10) AS s_cust,
  COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
