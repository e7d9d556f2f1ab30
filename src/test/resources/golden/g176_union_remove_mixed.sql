-- union_remove_2.q shape: agg branch UNION ALL map-only branch into a sink table
DROP TABLE IF EXISTS g176_out;
CREATE TABLE g176_out (key STRING, val BIGINT) USING parquet;
INSERT OVERWRITE TABLE g176_out
SELECT * FROM (
  SELECT o_orderstatus AS key, count(1) AS val FROM orders GROUP BY o_orderstatus
  UNION ALL
  SELECT o_orderstatus AS key, CAST(o_custkey % 3 AS BIGINT) AS val FROM orders WHERE o_orderkey < 100) a;
SELECT key, val, count(*) AS n FROM g176_out GROUP BY key, val
