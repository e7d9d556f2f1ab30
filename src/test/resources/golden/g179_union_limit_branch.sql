-- union_remove_17.q shape: a LIMITed branch unioned with a filtered branch
SELECT key, count(*) AS n FROM (
  SELECT o_orderstatus AS key FROM (SELECT o_orderstatus, o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10) t
  UNION ALL
  SELECT o_orderpriority AS key FROM orders WHERE o_orderkey <= 5) u
GROUP BY key
