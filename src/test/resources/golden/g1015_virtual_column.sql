-- virtual_column.q: INPUT__FILE__NAME participates in aggregation —
-- projected per row (non-null for every stored row) then counted per
-- key. (Spark refuses the nondeterministic call directly inside the
-- aggregate, so the projection is explicit — same value as Hive's
-- count(INPUT__FILE__NAME).)
DROP TABLE IF EXISTS g1015_src;
CREATE TABLE g1015_src USING parquet AS
  SELECT CAST(n_regionkey AS STRING) AS key, n_name AS value FROM nation;
SELECT key, count(f) AS cnt, (count(f) = count(*)) AS all_nonnull
FROM (SELECT key, INPUT__FILE__NAME AS f FROM g1015_src) t
GROUP BY key ORDER BY key
