SELECT DISTINCT * FROM (
  SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey <= 500) t
