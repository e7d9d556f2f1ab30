-- reference: ql/src/test/queries/clientpositive/parquet_ctas.q — CTAS
-- into parquet: plain star copy, computed columns, aliased, and mixed
-- select lists all carry their schema into the parquet table.
DROP TABLE IF EXISTS g1065_staging;
DROP TABLE IF EXISTS g1065_ctas;
DROP TABLE IF EXISTS g1065_ctas_alias;
DROP TABLE IF EXISTS g1065_ctas_mixed;
CREATE TABLE g1065_staging STORED AS TEXTFILE AS
  SELECT CAST(n_nationkey AS INT) AS key, n_name AS value
  FROM nation ORDER BY key LIMIT 10;
CREATE TABLE g1065_ctas STORED AS PARQUET AS SELECT * FROM g1065_staging;
CREATE TABLE g1065_ctas_alias STORED AS PARQUET AS
  SELECT key + 1 AS mykey, concat(value, 'value') AS myvalue FROM g1065_staging;
CREATE TABLE g1065_ctas_mixed STORED AS PARQUET AS
  SELECT key, key + 1 AS kplus, concat(value, 'value') AS myvalue FROM g1065_staging;
SELECT a.key, a.value, b.mykey, b.myvalue, c.kplus
FROM g1065_ctas a
JOIN g1065_ctas_alias b ON a.key + 1 = b.mykey
JOIN g1065_ctas_mixed c ON a.key = c.key
