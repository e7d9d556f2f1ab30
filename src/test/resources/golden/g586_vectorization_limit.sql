-- vectorization_limit.q: ORDER BY + LIMIT through a deterministic
-- tie-free key, LIMIT 0, and DISTINCT + LIMIT over a bounded domain.
SELECT * FROM (
  SELECT l_orderkey, l_linenumber FROM lineitem
  ORDER BY l_orderkey, l_linenumber LIMIT 5) a
UNION ALL
SELECT -1, (SELECT COUNT(*) FROM (SELECT 1 FROM lineitem LIMIT 0) z)
UNION ALL
SELECT -2, (SELECT COUNT(*) FROM (SELECT DISTINCT l_linenumber FROM lineitem LIMIT 3) w)
