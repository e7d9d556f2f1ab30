-- join28.q..join31.q shapes: mapjoin hints inside nested subqueries — a
-- hinted join whose left side is itself a hinted join subquery, and a
-- semi-join-like exists via LEFT SEMI.
SELECT 'nested' AS tag, z.n_name AS name, cast(z.rk AS STRING) AS v
FROM (
  SELECT /*+ MAPJOIN(r) */ n.n_name, r.r_regionkey AS rk
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_regionkey < 3
) z
UNION ALL
SELECT 'semi', n.n_name, NULL
FROM nation n LEFT SEMI JOIN (
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 1000
) s ON n.n_nationkey = s.s_nationkey
