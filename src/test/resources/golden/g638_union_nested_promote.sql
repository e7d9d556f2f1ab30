-- union23.q / union25.q / union28.q / union29.q / union30.q / union33.q:
-- nested unions (a union inside a union branch), subquery-wrapped
-- branches, and a union branch that is itself a grouped subquery.
SELECT k, SUM(n) AS s FROM (
  SELECT n_regionkey AS k, COUNT(*) AS n FROM nation GROUP BY n_regionkey
  UNION ALL
  SELECT k, n FROM (
    SELECT r_regionkey AS k, 10 AS n FROM region
    UNION ALL
    SELECT CAST(99 AS BIGINT), 1) inner_u
) outer_u
GROUP BY k
