-- union_remove_24/25.q shape: branch key types coerce (double vs bigint)
SELECT key, count(*) AS n FROM (
  SELECT CAST(o_custkey AS DOUBLE) AS key FROM orders WHERE o_custkey < 10
  UNION ALL
  SELECT CAST(o_custkey % 3 AS BIGINT) AS key FROM orders WHERE o_orderkey < 50) u
GROUP BY key
