-- groupby12.q: aggregates-only select list with a GROUP BY key that is
-- NOT projected (SELECT count(key), count(DISTINCT value) GROUP BY key)
-- — legal in Hive, one row per key, the key itself dropped.
DROP TABLE IF EXISTS g940_src;
CREATE TABLE g940_src USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key,
         concat('val_', n_regionkey) AS value FROM nation;
DROP TABLE IF EXISTS g940_dest;
CREATE TABLE g940_dest (key INT, value STRING) USING parquet;
FROM g940_src
INSERT OVERWRITE TABLE g940_dest
  SELECT COUNT(g940_src.key), COUNT(DISTINCT value) GROUP BY g940_src.key;
SELECT g940_dest.* FROM g940_dest
