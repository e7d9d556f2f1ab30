-- vector_decimal_6.q: UNION ALL across two decimal precisions
-- (10,5)+(17,4) resolves to their common wider type, and a CTAS over
-- key + 5.5 / value * 11 derives the arithmetic result types.
DROP TABLE IF EXISTS g955_d61;
DROP TABLE IF EXISTS g955_d62;
DROP TABLE IF EXISTS g955_d63;
CREATE TABLE g955_d61 (key DECIMAL(10,5), value INT) USING parquet;
CREATE TABLE g955_d62 (key DECIMAL(17,4), value INT) USING parquet;
INSERT INTO g955_d61 VALUES
  (CAST('-4400' AS DECIMAL(10,5)), 4400),
  (CAST('23232.23435' AS DECIMAL(10,5)), 2),
  (CAST('-1255.49' AS DECIMAL(10,5)), -1255),
  (CAST('3.14' AS DECIMAL(10,5)), 3),
  (NULL, 0);
INSERT INTO g955_d62 VALUES
  (CAST('2389432.2375' AS DECIMAL(17,4)), 4),
  (CAST('-1234567890.1234567890' AS DECIMAL(17,4)), -1234567890),
  (CAST('3.14' AS DECIMAL(17,4)), 3),
  (NULL, 0);
CREATE TABLE g955_d63 USING parquet AS
  SELECT key + 5.5 AS k, value * 11 AS v FROM g955_d61;
SELECT 'union' AS probe, T.key AS k, CAST(NULL AS INT) AS v FROM (
  SELECT key, value FROM g955_d61
  UNION ALL
  SELECT key, value FROM g955_d62
) T
UNION ALL
SELECT 'ctas' AS probe, k, CAST(v AS INT) AS v FROM g955_d63
