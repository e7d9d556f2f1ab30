-- parenthesis_star_by.q: CLUSTER BY / SORT BY / DISTRIBUTE BY accept
-- both bare column lists and PARENTHESIZED lists — same results.
DROP TABLE IF EXISTS g993_src;
CREATE TABLE g993_src USING parquet AS
  SELECT CAST(n_regionkey AS STRING) AS key, n_name AS value FROM nation;
SELECT 'bare' AS probe, key, value FROM (
  SELECT key, value FROM g993_src CLUSTER BY key, value) a
UNION ALL
SELECT 'paren' AS probe, key, value FROM (
  SELECT key, value FROM g993_src CLUSTER BY (key, value)) b
UNION ALL
SELECT 'sortp' AS probe, key, value FROM (
  SELECT key, value FROM g993_src SORT BY (key, value)) c
UNION ALL
SELECT 'distp' AS probe, key, value FROM (
  SELECT key, value FROM g993_src DISTRIBUTE BY (key, value)) d
