-- groupby_complex_types_multi_single_reducer.q: multi-insert branches that
-- GROUP BY constructed complex keys — ARRAY(key) and a STRUCT key — each
-- with its own branch ORDER BY + LIMIT. (Hive also groups by MAP keys;
-- map is not an orderable grouping key in Spark, so the struct branch
-- carries the composite-key semantics — see COVERAGE.md.)
DROP TABLE IF EXISTS g538_src;
DROP TABLE IF EXISTS g538_d1;
DROP TABLE IF EXISTS g538_d2;
CREATE TABLE g538_src USING parquet AS
  SELECT CAST(n_nationkey % 7 AS STRING) AS key, concat('val_', n_nationkey % 7) AS value
  FROM nation;
CREATE TABLE g538_d1 (key ARRAY<STRING>, value BIGINT) USING parquet;
CREATE TABLE g538_d2 (key STRUCT<k: STRING, v: STRING>, value BIGINT) USING parquet;
FROM g538_src src
INSERT OVERWRITE TABLE g538_d1
  SELECT ARRAY(src.key), COUNT(1) GROUP BY ARRAY(src.key) ORDER BY 1 LIMIT 5
INSERT OVERWRITE TABLE g538_d2
  SELECT named_struct('k', src.key, 'v', src.value), COUNT(1)
  GROUP BY named_struct('k', src.key, 'v', src.value) ORDER BY 1 LIMIT 5;
SELECT 'd1' AS v, CAST(key AS STRING) AS k, value FROM g538_d1
UNION ALL
SELECT 'd2', CAST(key AS STRING), value FROM g538_d2
