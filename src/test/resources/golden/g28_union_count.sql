SELECT count(*) AS n FROM (
  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O') u
