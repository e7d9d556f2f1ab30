-- groupby_map_ppr_multi_distinct.q: FOUR aggregates over one partition-
-- pruned scan — two DISTINCT aggs on different expressions (count + sum
-- over substr), one plain sum inside concat, one count(DISTINCT) on the
-- raw column — all in a single multi-insert branch GROUP BY.
DROP TABLE IF EXISTS g561_srcpart;
DROP TABLE IF EXISTS g561_dest;
CREATE TABLE g561_srcpart (key STRING, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g561_srcpart PARTITION (ds='2008-04-08')
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey % 6) FROM nation;
INSERT INTO g561_srcpart PARTITION (ds='2008-04-09')
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey % 2) FROM nation;
CREATE TABLE g561_dest (key STRING, c1 INT, c2 STRING, c3 INT, c4 INT) USING parquet;
FROM g561_srcpart src
INSERT OVERWRITE TABLE g561_dest
SELECT substr(src.key, 1, 1), count(DISTINCT substr(src.value, 5)),
       concat(substr(src.key, 1, 1), sum(substr(src.value, 5))),
       sum(DISTINCT substr(src.value, 5)), count(DISTINCT src.value)
WHERE src.ds = '2008-04-08'
GROUP BY substr(src.key, 1, 1);
SELECT key, c1, c2, c3, c4 FROM g561_dest
