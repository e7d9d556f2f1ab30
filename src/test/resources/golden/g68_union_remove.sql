DROP TABLE IF EXISTS g68_out;
CREATE TABLE g68_out (key STRING, cnt BIGINT) USING parquet;
INSERT OVERWRITE TABLE g68_out
SELECT * FROM (
  SELECT o_orderstatus AS key, count(1) AS cnt FROM orders GROUP BY o_orderstatus
  UNION ALL
  SELECT o_orderpriority AS key, count(1) AS cnt FROM orders GROUP BY o_orderpriority) u;
SELECT key, cnt FROM g68_out
