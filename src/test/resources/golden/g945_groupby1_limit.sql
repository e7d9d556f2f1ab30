-- groupby1_limit.q: grouped sum over substr(value, 5) (string slices
-- summing numerically via Hive's string->double coercion), ORDER BY +
-- LIMIT landing through an INSERT OVERWRITE.
DROP TABLE IF EXISTS g945_src;
CREATE TABLE g945_src USING parquet AS
  SELECT CAST(o_orderkey % 20 AS STRING) AS key,
         concat('val_', o_orderkey % 100) AS value
  FROM orders WHERE o_orderkey < 400;
DROP TABLE IF EXISTS g945_dest;
CREATE TABLE g945_dest (key INT, value DOUBLE) USING parquet;
FROM g945_src INSERT OVERWRITE TABLE g945_dest
  SELECT g945_src.key, sum(substr(g945_src.value, 5))
  GROUP BY g945_src.key ORDER BY g945_src.key LIMIT 5;
SELECT g945_dest.* FROM g945_dest
