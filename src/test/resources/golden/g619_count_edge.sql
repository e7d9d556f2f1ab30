-- count.q: count over all-NULL column, count(DISTINCT) with NULLs,
-- count(*) vs count(col) divergence, empty-input global aggregates.
SELECT COUNT(*) AS n_star, COUNT(x) AS n_col, COUNT(DISTINCT x) AS n_dist,
       SUM(x) AS s, MAX(x) AS mx
FROM (SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey % 4 END AS x
      FROM nation) t
UNION ALL
SELECT COUNT(*), COUNT(x), COUNT(DISTINCT x), SUM(x), MAX(x)
FROM (SELECT 1 AS x) e WHERE x = 99
