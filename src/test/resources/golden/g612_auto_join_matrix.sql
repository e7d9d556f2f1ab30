-- auto_join1.q/auto_join8.q/auto_join13.q family representatives: the
-- auto-converted (broadcast) join in inner/left-with-null-filter/
-- chained-with-expression shapes; results must match the reduce join.
SELECT 'inner' AS tag, COUNT(*) AS n, SUM(h) AS s FROM (
  SELECT n1.n_nationkey AS h FROM nation n1 JOIN nation n2 ON n1.n_nationkey = n2.n_nationkey) a
UNION ALL
SELECT 'left_nullfil', COUNT(*), SUM(x.n_nationkey) FROM (
  SELECT n1.n_nationkey, n2.r_name AS rn FROM nation n1
  LEFT OUTER JOIN region n2 ON n1.n_regionkey = n2.r_regionkey AND n2.r_regionkey < 2) x
  WHERE x.rn IS NULL
UNION ALL
SELECT 'chain_expr', COUNT(*), SUM(c.n_nationkey) FROM nation a
  JOIN nation b ON a.n_nationkey + 1 = b.n_nationkey
  JOIN nation c ON b.n_nationkey + 1 = c.n_nationkey
