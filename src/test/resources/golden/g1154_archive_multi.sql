-- reference: ql/src/test/queries/clientpositive/archive_multi2.q (+
-- archive_multi4.q, archive_multi5.q, archive_multi6.q,
-- archive_multi7.q) — ARCHIVE at the ds PREFIX over (ds, hr)
-- partitions: both hr sub-partitions stay readable while archived,
-- and UNARCHIVE restores the original layout byte-for-byte.
set hive.archive.enabled=true;
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1154_tstsrcpart;
CREATE TABLE g1154_tstsrcpart (key STRING, value STRING)
  PARTITIONED BY (ds STRING, hr STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1154_tstsrcpart PARTITION (ds='2008-04-08', hr='11')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
INSERT OVERWRITE TABLE g1154_tstsrcpart PARTITION (ds='2008-04-08', hr='12')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
ALTER TABLE g1154_tstsrcpart ARCHIVE PARTITION (ds='2008-04-08');
SELECT (SELECT count(*) FROM g1154_tstsrcpart WHERE ds='2008-04-08') AS archived_all,
       (SELECT count(*) FROM g1154_tstsrcpart
        WHERE ds='2008-04-08' AND hr='12') AS archived_hr12
FROM nation TABLESAMPLE (1 ROWS);
ALTER TABLE g1154_tstsrcpart UNARCHIVE PARTITION (ds='2008-04-08');
SELECT (SELECT count(*) FROM g1154_tstsrcpart WHERE ds='2008-04-08') AS restored_all,
       (SELECT sum(CAST(key AS INT)) FROM g1154_tstsrcpart) AS restored_sum
