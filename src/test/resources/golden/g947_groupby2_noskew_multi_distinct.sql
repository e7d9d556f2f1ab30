-- groupby2_noskew_multi_distinct.q: TWO DISTINCT aggregates over
-- different expressions of the same input (count(DISTINCT substr) +
-- sum(DISTINCT substr)) next to plain aggregates, keyed on a substr of
-- the key — the multi-distinct single-stage shape.
DROP TABLE IF EXISTS g947_src;
CREATE TABLE g947_src USING parquet AS
  SELECT CAST(o_orderkey AS STRING) AS key,
         concat('val_', o_orderkey % 50) AS value
  FROM orders WHERE o_orderkey < 300;
DROP TABLE IF EXISTS g947_dest;
CREATE TABLE g947_dest (key STRING, c1 INT, c2 STRING, c3 INT, c4 INT)
  USING parquet;
FROM g947_src
INSERT OVERWRITE TABLE g947_dest
  SELECT substr(g947_src.key, 1, 1),
         count(DISTINCT substr(g947_src.value, 5)),
         concat(substr(g947_src.key, 1, 1), sum(substr(g947_src.value, 5))),
         sum(DISTINCT substr(g947_src.value, 5)),
         count(g947_src.value)
  GROUP BY substr(g947_src.key, 1, 1);
SELECT g947_dest.* FROM g947_dest
