-- groupby11.q: one FROM-first multi-insert computing count +
-- count(DISTINCT) grouped by DIFFERENT keys per branch, into
-- PARTITIONED destinations.
DROP TABLE IF EXISTS g870_d1;
DROP TABLE IF EXISTS g870_d2;
CREATE TABLE g870_d1 (key STRING, val1 BIGINT, val2 BIGINT)
  USING parquet PARTITIONED BY (ds STRING);
CREATE TABLE g870_d2 (key STRING, val1 BIGINT, val2 BIGINT)
  USING parquet PARTITIONED BY (ds STRING);
FROM orders
INSERT OVERWRITE TABLE g870_d1 PARTITION (ds='111')
  SELECT o_orderstatus, count(o_orderkey), count(DISTINCT o_custkey % 50)
  GROUP BY o_orderstatus
INSERT OVERWRITE TABLE g870_d2 PARTITION (ds='111')
  SELECT substr(o_orderpriority, 1, 1), count(o_orderkey),
         count(DISTINCT o_custkey % 50)
  GROUP BY substr(o_orderpriority, 1, 1);
SELECT 'd1' AS tag, key, val1, val2, ds FROM g870_d1
UNION ALL
SELECT 'd2', key, val1, val2, ds FROM g870_d2
