-- union_top_level.q: top-level UNION ALL branches each carrying their own
-- LIMIT inside parens, with a global ORDER BY applied to the union result.
(SELECT n_name AS name, 'nation' AS src FROM nation ORDER BY n_name LIMIT 3)
UNION ALL
(SELECT r_name, 'region' FROM region ORDER BY r_name LIMIT 2)
ORDER BY src, name;
