-- INTERSECT/EXCEPT treat NULL = NULL (unlike IN): set-op null semantics
SELECT 'i' AS op, k FROM (
  SELECT CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_orderstatus END AS k FROM orders WHERE o_orderkey <= 100
  INTERSECT
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS k FROM orders WHERE o_orderkey <= 100) a
UNION ALL
SELECT 'e' AS op, k FROM (
  SELECT CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_orderstatus END AS k FROM orders WHERE o_orderkey <= 100
  EXCEPT
  SELECT o_orderstatus AS k FROM orders WHERE o_orderkey <= 100) b
