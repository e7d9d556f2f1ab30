-- groupby_multi_single_reducer.q dest_h2 shape: a multi-insert branch with
-- its own ORDER BY + LIMIT (top-k per branch)
DROP TABLE IF EXISTS g402_top;
DROP TABLE IF EXISTS g402_all;
CREATE TABLE g402_top (seg STRING, n BIGINT) USING parquet;
CREATE TABLE g402_all (seg STRING, n BIGINT) USING parquet;
FROM customer
INSERT OVERWRITE TABLE g402_top
  SELECT c_mktsegment AS seg, count(1) AS n GROUP BY c_mktsegment ORDER BY n DESC, seg LIMIT 2
INSERT OVERWRITE TABLE g402_all
  SELECT c_mktsegment, count(1) GROUP BY c_mktsegment;
SELECT 'top' AS which, seg, n FROM g402_top
UNION ALL
SELECT 'all' AS which, seg, n FROM g402_all;
