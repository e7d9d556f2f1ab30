-- groupby_multi_single_reducer3.q (HIVE-3849): multi-insert where each
-- branch carries its own WHERE + GROUP BY over the shared scan — with
-- source-qualified refs (src.value), string-key IN (int-list) coercion,
-- and the OR/AND precedence mix `a OR b OR c AND d`.
DROP TABLE IF EXISTS g536_src;
DROP TABLE IF EXISTS g536_e1;
DROP TABLE IF EXISTS g536_e2;
CREATE TABLE g536_src USING parquet AS
  SELECT CAST(n_nationkey * 50 AS STRING) AS key,
         concat('val_', n_nationkey * 50) AS value
  FROM nation;
CREATE TABLE g536_e1 (key STRING, cnt BIGINT) USING parquet;
CREATE TABLE g536_e2 (key STRING, cnt BIGINT) USING parquet;
FROM g536_src src
INSERT OVERWRITE TABLE g536_e1
SELECT key, count(*)
WHERE src.value IN ('val_100', 'val_200', 'val_300') AND key IN (100, 150, 200)
GROUP BY key
INSERT OVERWRITE TABLE g536_e2
SELECT key, count(*)
WHERE src.key + src.key = 200 OR src.key - 100 = 100 OR src.key = 300 AND value IS NOT NULL
GROUP BY key;
SELECT 'e1' AS v, key, cnt FROM g536_e1
UNION ALL
SELECT 'e2', key, cnt FROM g536_e2
