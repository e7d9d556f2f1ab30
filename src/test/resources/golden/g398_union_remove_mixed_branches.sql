-- union_remove_3.q shape: a map-only branch unioned with two aggregate
-- branches (mixed parallelism between branches)
SELECT seg, n FROM (
  SELECT c_mktsegment AS seg, cast(1 AS BIGINT) AS n FROM customer WHERE c_custkey <= 5
  UNION ALL
  SELECT c_mktsegment AS seg, count(1) AS n FROM customer GROUP BY c_mktsegment
  UNION ALL
  SELECT c_mktsegment AS seg, count(DISTINCT c_nationkey) AS n FROM customer GROUP BY c_mktsegment
) u
