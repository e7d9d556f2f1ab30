-- union_null.q: bare NULL branches take the other branch's type
SELECT x FROM (
  SELECT o_orderstatus AS x FROM orders WHERE o_orderkey <= 20
  UNION ALL
  SELECT NULL FROM orders WHERE o_orderkey <= 3) u;
SELECT count(*) AS n, count(x) AS nn FROM (
  SELECT CAST(NULL AS STRING) AS x FROM orders WHERE o_orderkey <= 10
  UNION ALL
  SELECT o_orderstatus FROM orders WHERE o_orderkey <= 20) u
