-- union_remove_1.q: union of two grouped subqueries landing through an
-- INSERT — the union-removal physical optimization must not change the
-- doubled row multiset.
DROP TABLE IF EXISTS g1005_in;
DROP TABLE IF EXISTS g1005_out;
CREATE TABLE g1005_in USING parquet AS
  SELECT CAST(n_regionkey AS STRING) AS key, n_name AS val FROM nation;
CREATE TABLE g1005_out (key STRING, vals BIGINT) USING parquet;
INSERT OVERWRITE TABLE g1005_out
SELECT * FROM (
  SELECT key, count(1) AS vals FROM g1005_in GROUP BY key
  UNION ALL
  SELECT key, count(1) AS vals FROM g1005_in GROUP BY key
) t;
SELECT key, vals FROM g1005_out
