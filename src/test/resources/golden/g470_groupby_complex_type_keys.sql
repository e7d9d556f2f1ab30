-- groupby_complex_types.q (array/struct halves; map keys are not
-- orderable on Spark — documented): GROUP BY ARRAY(...) and
-- GROUP BY STRUCT(...), multi-inserted from one scan.
DROP TABLE IF EXISTS g470_d1;
DROP TABLE IF EXISTS g470_d3;
CREATE TABLE g470_d1 (key ARRAY<STRING>, value BIGINT);
CREATE TABLE g470_d3 (key STRUCT<col1:STRING, col2:STRING>, value BIGINT);
FROM nation
INSERT OVERWRITE TABLE g470_d1
  SELECT ARRAY(n_name), COUNT(1) GROUP BY ARRAY(n_name)
INSERT OVERWRITE TABLE g470_d3
  SELECT STRUCT(n_name, cast(n_regionkey AS STRING)), COUNT(1)
  GROUP BY STRUCT(n_name, cast(n_regionkey AS STRING));
SELECT 'd1' AS src, key[0] AS k1, NULL AS k2, value FROM g470_d1
UNION ALL
SELECT 'd3', key.col1, key.col2, value FROM g470_d3
