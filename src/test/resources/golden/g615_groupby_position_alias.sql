-- groupby_position.q + having2.q: GROUP BY ordinal positions, aliases in
-- HAVING, and ORDER BY position through the canonical sort.
SELECT n_regionkey AS rk, COUNT(*) AS cnt
FROM nation GROUP BY 1 HAVING cnt > 4
