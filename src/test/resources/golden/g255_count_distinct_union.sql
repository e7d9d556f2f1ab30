SELECT count(DISTINCT k) AS dk, count(k) AS nk FROM (
  SELECT o_orderstatus AS k FROM orders
  UNION ALL
  SELECT l_returnflag AS k FROM lineitem) u
