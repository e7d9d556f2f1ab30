-- groupby_ppr_multi_distinct.q: multi-DISTINCT aggregate under a
-- PARTITION-PRUNED scan (WHERE on the partition column reaches the
-- listing, not a post-filter) with THREE distincts in one grouping.
DROP TABLE IF EXISTS g948_srcpart;
CREATE TABLE g948_srcpart (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
SET hive.exec.dynamic.partition.mode=nonstrict;
INSERT OVERWRITE TABLE g948_srcpart PARTITION (ds)
  SELECT CAST(o_orderkey AS STRING), concat('val_', o_orderkey % 40),
         CASE WHEN o_orderkey % 2 = 0 THEN '2008-04-08' ELSE '2008-04-09' END
  FROM orders WHERE o_orderkey < 300;
DROP TABLE IF EXISTS g948_dest;
CREATE TABLE g948_dest (key STRING, c1 INT, c2 STRING, c3 INT, c4 INT)
  USING parquet;
FROM g948_srcpart src
INSERT OVERWRITE TABLE g948_dest
  SELECT substr(src.key, 1, 1),
         count(DISTINCT substr(src.value, 5)),
         concat(substr(src.key, 1, 1), sum(substr(src.value, 5))),
         sum(DISTINCT substr(src.value, 5)),
         count(DISTINCT src.value)
  WHERE src.ds = '2008-04-08'
  GROUP BY substr(src.key, 1, 1);
SELECT g948_dest.* FROM g948_dest
