-- uniquejoin.q: Hive's FROM UNIQUEJOIN PRESERVE a (a.k), b (b.k) SELECT
-- maps onto operators/UniqueJoin.uniqueJoin (q116 ORACLED, 3-mode spec);
-- this golden pins the SQL-equivalent shape: full-outer chain on the
-- shared key with per-table presence, one row per key.
SELECT k, has_a, has_b FROM (
  SELECT COALESCE(a.k, b.k) AS k,
         CAST(a.k IS NOT NULL AS STRING) AS has_a,
         CAST(b.k IS NOT NULL AS STRING) AS has_b
  FROM (SELECT DISTINCT n_nationkey AS k FROM nation WHERE n_nationkey < 8) a
  FULL OUTER JOIN (SELECT DISTINCT n_nationkey AS k FROM nation WHERE n_nationkey BETWEEN 5 AND 12) b
  ON a.k = b.k) u
