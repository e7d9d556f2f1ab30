-- unionDistinct_2.q: bare UNION means DISTINCT across three inputs
-- with overlapping rows; UNION ALL keeps the duplicates; mixing both
-- applies each operator at its own level.
DROP TABLE IF EXISTS g1010_u1;
DROP TABLE IF EXISTS g1010_u2;
DROP TABLE IF EXISTS g1010_u3;
CREATE TABLE g1010_u1 USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value
  FROM nation ORDER BY n_nationkey LIMIT 5;
CREATE TABLE g1010_u2 USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value
  FROM nation ORDER BY n_nationkey LIMIT 3;
CREATE TABLE g1010_u3 USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value
  FROM nation ORDER BY n_nationkey DESC LIMIT 5;
SELECT 'all' AS probe, key, value FROM (
  SELECT key, value FROM g1010_u1
  UNION ALL
  SELECT key, value FROM g1010_u2
  UNION ALL
  SELECT key AS key, value FROM g1010_u3
) tab
UNION ALL
SELECT 'dist' AS probe, key, value FROM (
  SELECT key, value FROM g1010_u1
  UNION
  SELECT key, value FROM g1010_u2
  UNION
  SELECT key AS key, value FROM g1010_u3
) tab2
