-- mapjoin_decimal.q: equi-join on DECIMAL keys of different precisions
-- (dec(4,0) vs dec(14,2) in the reference) — values must compare
-- numerically across the precision gap.
SELECT a.k, a.tag, b.tag AS btag FROM (
  SELECT CAST(n_nationkey AS DECIMAL(4, 0)) AS k, 'narrow' AS tag
  FROM nation WHERE n_nationkey < 5
) a
JOIN (
  SELECT CAST(n_nationkey AS DECIMAL(14, 2)) AS k, 'wide' AS tag
  FROM nation WHERE n_nationkey < 8
) b ON a.k = b.k
ORDER BY a.k;
