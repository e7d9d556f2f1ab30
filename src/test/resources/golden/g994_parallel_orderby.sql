-- parallel_orderby.q: total ORDER BY into a CTAS with duplicate keys
-- (the stem loads kv5 twice) — the sampled parallel total-order path
-- must produce the exact sorted sequence a single reducer would.
DROP TABLE IF EXISTS g994_src5;
CREATE TABLE g994_src5 USING parquet AS
  SELECT CAST(n_nationkey % 5 AS STRING) AS key, n_name AS value
  FROM nation
  UNION ALL
  SELECT CAST(n_nationkey % 5 AS STRING), n_name FROM nation;
DROP TABLE IF EXISTS g994_ord;
CREATE TABLE g994_ord USING parquet AS
  SELECT * FROM g994_src5 ORDER BY key, value;
SELECT key, value FROM g994_ord
