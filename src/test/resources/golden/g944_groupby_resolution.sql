-- groupby_resolution.q: a GROUP BY key referenced through the table
-- alias resolves the same as the bare column (group by b.key vs key),
-- and windowing composes after the grouped aggregate — rank() over the
-- count(*) ordering.
DROP TABLE IF EXISTS g944_src;
CREATE TABLE g944_src USING parquet AS
  SELECT CAST(n_regionkey AS STRING) AS key,
         concat('val_', n_nationkey) AS value FROM nation;
SELECT key, count(*) AS cnt, rank() OVER (ORDER BY count(*)) AS rnk
FROM g944_src b
WHERE key < '12'
GROUP BY b.key
ORDER BY b.key
