-- load_dyn_part2.q: dynamic-partition INSERT OVERWRITE into a BUCKETED
-- partitioned table — static ds + dynamic hr from the source's own hr
-- column, run TWICE (second pass overwrites each landed partition);
-- SHOW PARTITIONS-equivalent check via per-partition counts.
DROP TABLE IF EXISTS g560_srcpart;
DROP TABLE IF EXISTS g560_bucket;
CREATE TABLE g560_srcpart (key STRING, value STRING) PARTITIONED BY (ds STRING, hr STRING);
INSERT INTO g560_srcpart PARTITION (ds='2008-04-08', hr='11')
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 6;
INSERT INTO g560_srcpart PARTITION (ds='2008-04-08', hr='12')
  SELECT CAST(n_nationkey AS STRING), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 4;
CREATE TABLE g560_bucket (key STRING, value STRING)
  PARTITIONED BY (ds STRING, hr STRING)
  CLUSTERED BY (key) INTO 10 BUCKETS;
INSERT OVERWRITE TABLE g560_bucket PARTITION (ds='2010-03-23', hr)
  SELECT key, value, hr FROM g560_srcpart WHERE ds IS NOT NULL AND hr IS NOT NULL;
INSERT OVERWRITE TABLE g560_bucket PARTITION (ds='2010-03-23', hr)
  SELECT key, value, hr FROM g560_srcpart WHERE ds IS NOT NULL AND hr IS NOT NULL;
SELECT 'p11' AS v, key, value FROM g560_bucket WHERE ds='2010-03-23' AND hr='11'
UNION ALL
SELECT 'p12', key, value FROM g560_bucket WHERE ds='2010-03-23' AND hr='12'
UNION ALL
SELECT 'counts', concat(ds, '/', hr), CAST(count(*) AS STRING)
FROM g560_bucket GROUP BY ds, hr
