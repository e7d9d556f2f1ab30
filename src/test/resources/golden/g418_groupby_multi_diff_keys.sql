-- groupby_multi_single_reducer2.q: branches with DIFFERENT group keys from
-- one source scan
DROP TABLE IF EXISTS g418_a;
DROP TABLE IF EXISTS g418_b;
CREATE TABLE g418_a (k STRING, n BIGINT) USING parquet;
CREATE TABLE g418_b (k STRING, n BIGINT) USING parquet;
FROM orders
INSERT OVERWRITE TABLE g418_a
  SELECT o_orderstatus, count(1) GROUP BY o_orderstatus
INSERT OVERWRITE TABLE g418_b
  SELECT substr(o_orderpriority, 1, 1), count(DISTINCT o_orderstatus)
  GROUP BY substr(o_orderpriority, 1, 1);
SELECT 'status' AS src, k, n FROM g418_a
UNION ALL
SELECT 'prio' AS src, k, n FROM g418_b;
