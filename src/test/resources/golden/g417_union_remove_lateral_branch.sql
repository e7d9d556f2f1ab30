-- union_remove_24.q shape: a lateral-view branch unioned with an agg branch
SELECT k, n FROM (
  SELECT tok AS k, cast(1 AS BIGINT) AS n
  FROM (SELECT split(r_name, '') AS cs FROM region) t
  LATERAL VIEW explode(cs) e AS tok
  WHERE tok >= 'A' AND tok <= 'E'
  UNION ALL
  SELECT r_name AS k, count(1) AS n FROM region GROUP BY r_name
) u
