-- groupby2_limit.q: the same grouped sum as a direct query — ORDER BY
-- the group key with LIMIT 5 (TopN over an aggregate, no insert).
DROP TABLE IF EXISTS g946_src;
CREATE TABLE g946_src USING parquet AS
  SELECT CAST(o_orderkey % 20 AS STRING) AS key,
         concat('val_', o_orderkey % 100) AS value
  FROM orders WHERE o_orderkey < 400;
SELECT g946_src.key AS key, sum(substr(g946_src.value, 5)) AS s
FROM g946_src GROUP BY g946_src.key ORDER BY g946_src.key LIMIT 5
