-- ppd_union.q: an outer filter over a UNION ALL of two oppositely
-- filtered branches — the predicate must apply to both legs.
SELECT u.key, u.value FROM (
  SELECT o_orderkey AS key, o_orderstatus AS value FROM orders
  WHERE o_orderkey < 100
  UNION ALL
  SELECT o_orderkey AS key, o_orderstatus AS value FROM orders
  WHERE o_orderkey > 150 AND o_orderkey < 300
) u
WHERE u.key > 40 AND u.value > 'A'
