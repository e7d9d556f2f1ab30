-- vectorization_1.q, vectorization_2.q, vectorization_3.q,
-- vectorization_4.q, vectorization_5.q, vectorization_6.q,
-- vectorization_9.q, vectorization_10.q, vectorization_11.q,
-- vectorization_16.q: the filtered-aggregate matrix — each file is one
-- wide projection of aggregates over arithmetic under a compound
-- predicate; pinned here over the lineitem numerics.
SELECT CAST(SUM(l_quantity * 2 - l_linenumber) AS BIGINT) AS s1,
  ROUND(AVG(l_extendedprice / (l_quantity + 1)) * 10000) / 10000 AS s2,
  MAX(CAST(l_quantity AS TINYINT)) AS s3,
  MIN(-(l_discount)) AS s4,
  COUNT(*) AS s5,
  ROUND(stddev(l_tax) * 1000000) / 1000000 AS s6,
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE -l_quantity END) AS BIGINT) AS s7
FROM lineitem
WHERE (l_quantity > 5 AND l_discount < 0.08) OR (l_linenumber = 1 AND l_tax >= 0.02)
