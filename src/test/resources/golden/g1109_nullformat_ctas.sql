-- reference: ql/src/test/queries/clientpositive/nullformatCTAS.q — CTAS
-- carrying ROW FORMAT DELIMITED NULL DEFINED AS 'fooNull': NULLs write
-- as the custom token and read back as NULL; a non-null value that
-- EQUALS the token reads as NULL after the fact (the serde cannot tell
-- them apart — reference behavior).
DROP TABLE IF EXISTS g1109_base;
DROP TABLE IF EXISTS g1109_null3;
CREATE TABLE g1109_base (a STRING, b STRING) USING parquet;
INSERT INTO g1109_base
  SELECT CASE WHEN n_nationkey % 2 = 0 THEN n_name ELSE NULL END,
         CAST(n_nationkey AS STRING)
  FROM nation WHERE n_nationkey < 6;
CREATE TABLE g1109_null3 ROW FORMAT DELIMITED NULL DEFINED AS 'fooNull'
  AS SELECT a, b FROM g1109_base;
SELECT b, a, a IS NULL AS a_null FROM g1109_null3
