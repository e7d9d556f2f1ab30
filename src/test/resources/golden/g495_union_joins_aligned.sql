-- union22.q shape: UNION ALL whose branches are joins with differing
-- shapes, aligned by aliases; an aggregate over the union.
SELECT k, count(*) AS n, min(src) AS first_src
FROM (
  SELECT n.n_regionkey AS k, 'nr' AS src
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
  UNION ALL
  SELECT cast(s.s_nationkey % 5 AS INT), 'sup'
  FROM supplier s JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
) u
GROUP BY k
