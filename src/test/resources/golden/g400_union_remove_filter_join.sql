-- union_remove_19.q shape: filter applied on top of a union output, then
-- joined — the filter must apply to BOTH branches
SELECT u.k, u.n, r_name
FROM (
  SELECT n_regionkey AS k, count(1) AS n FROM nation GROUP BY n_regionkey
  UNION ALL
  SELECT n_regionkey AS k, cast(n_nationkey AS BIGINT) AS n FROM nation WHERE n_nationkey < 3
) u
JOIN region ON u.k = r_regionkey
WHERE u.n >= 2
