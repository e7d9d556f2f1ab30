-- three-branch UNION (DISTINCT is the Hive default for bare UNION)
SELECT key FROM (
  SELECT o_orderstatus AS key FROM orders
  UNION
  SELECT o_orderpriority AS key FROM orders
  UNION
  SELECT l_returnflag AS key FROM lineitem) u
