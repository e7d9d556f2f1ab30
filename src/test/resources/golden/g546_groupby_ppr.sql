-- groupby_ppr.q: partition-pruned multi-distinct aggregation INSIDE a
-- multi-insert branch — WHERE ds filter prunes to one partition, the
-- branch computes count(DISTINCT substr(value, 5)) plus a concat over a
-- sum of substrings (string → double coercion inside SUM).
DROP TABLE IF EXISTS g546_srcpart;
DROP TABLE IF EXISTS g546_dest;
CREATE TABLE g546_srcpart (key STRING, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g546_srcpart PARTITION (ds='2008-04-08')
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey % 6) FROM nation;
INSERT INTO g546_srcpart PARTITION (ds='2008-04-09')
  SELECT CAST(n_nationkey * 7 AS STRING), concat('val_', n_nationkey % 3) FROM nation;
CREATE TABLE g546_dest (key STRING, c1 INT, c2 STRING) USING parquet;
FROM g546_srcpart src
INSERT OVERWRITE TABLE g546_dest
SELECT substr(src.key, 1, 1), count(DISTINCT substr(src.value, 5)),
       concat(substr(src.key, 1, 1), sum(substr(src.value, 5)))
WHERE src.ds = '2008-04-08'
GROUP BY substr(src.key, 1, 1);
SELECT key, c1, c2 FROM g546_dest
