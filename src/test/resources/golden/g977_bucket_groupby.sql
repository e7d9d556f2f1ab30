-- bucket_groupby.q: grouping over a partitioned table ALTERed to be
-- clustered (bucket metadata added after creation), by the bare key, by
-- length(key) and by abs(length(key)) — bucketing metadata must not
-- change any grouped value.
DROP TABLE IF EXISTS g977_cg;
CREATE TABLE g977_cg (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
ALTER TABLE g977_cg CLUSTERED BY (key) INTO 1 BUCKETS;
INSERT OVERWRITE TABLE g977_cg PARTITION (ds='100')
  SELECT CAST(n_regionkey AS STRING) AS key, n_name AS value
  FROM nation SORT BY key;
INSERT OVERWRITE TABLE g977_cg PARTITION (ds='101')
  SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value
  FROM nation DISTRIBUTE BY key;
SELECT * FROM
  (SELECT 'k100' AS probe, key, count(1) AS cnt FROM g977_cg
   WHERE ds='100' GROUP BY key ORDER BY key LIMIT 10) a
UNION ALL
SELECT * FROM
  (SELECT 'len101' AS probe, CAST(length(key) AS STRING), count(1)
   FROM g977_cg WHERE ds='101' GROUP BY length(key)
   ORDER BY length(key) LIMIT 10) b
UNION ALL
SELECT * FROM
  (SELECT 'abslen' AS probe, CAST(abs(length(key)) AS STRING), count(1)
   FROM g977_cg WHERE ds='101' GROUP BY abs(length(key))
   ORDER BY abs(length(key)) LIMIT 10) c
