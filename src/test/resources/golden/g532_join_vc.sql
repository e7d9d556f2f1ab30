-- join_vc.q: Hive virtual columns referenced THROUGH a join, with a table
-- alias qualifier (t3.BLOCK__OFFSET__INSIDE__FILE) — the qualifier must be
-- stripped when the vcol maps onto Spark's row-scoped function, and the
-- column must survive ORDER BY + LIMIT over the join result.
DROP TABLE IF EXISTS g532_src;
CREATE TABLE g532_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
SELECT t3.BLOCK__OFFSET__INSIDE__FILE AS off, t3.key AS k, t3.value AS v
FROM g532_src t1
JOIN g532_src t2 ON t1.key = t2.key
JOIN g532_src t3 ON t2.value = t3.value
WHERE t1.key < 5
ORDER BY off, k, v
LIMIT 3
