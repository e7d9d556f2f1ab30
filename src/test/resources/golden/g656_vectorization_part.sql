-- vectorization_part.q, vectorization_part_project.q,
-- vectorization_pushdown.q, vectorization_nested_udf.q: vectorized
-- scans over a PARTITIONED table — partition-pruned aggregate,
-- projected partition column arithmetic, predicate pushdown past the
-- partition filter, nested function chains.
DROP TABLE IF EXISTS g656_p;
CREATE TABLE g656_p (k INT, q DOUBLE) USING parquet PARTITIONED BY (ds STRING);
INSERT OVERWRITE TABLE g656_p PARTITION (ds)
  SELECT CAST(l_orderkey AS INT), l_quantity,
         CASE WHEN l_orderkey % 2 = 0 THEN '2008-04-08' ELSE '2008-04-09' END
  FROM lineitem WHERE l_orderkey < 1000;
SELECT 'pruned_agg' AS tag, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s
FROM g656_p WHERE ds = '2008-04-08'
UNION ALL
SELECT 'part_project', COUNT(DISTINCT CONCAT(ds, '_', CAST(k % 10 AS STRING))), 0 FROM g656_p
UNION ALL
SELECT 'pushdown_past_part', COUNT(*), CAST(SUM(ABS(ROUND(q - 10))) AS BIGINT)
FROM g656_p WHERE ds = '2008-04-09' AND q > 25
