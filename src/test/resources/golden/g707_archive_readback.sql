-- mirrors clientpositive/archive_multi.q's core sequence: populate a
-- two-level partitioned table, ARCHIVE a prefix spec (every hr under the
-- ds), and re-select — the reference expects IDENTICAL results while the
-- partitions sit in the archive (reference exec/DDLTask.java:356-358;
-- here the files relocate to a hidden .graft_archive subtree and the
-- catalog partitions repoint, so the scan follows them).
set hive.archive.enabled=true;
DROP TABLE IF EXISTS g707_part;
CREATE TABLE g707_part (k INT, v STRING, ds STRING, hr STRING) USING parquet PARTITIONED BY (ds, hr);
INSERT INTO g707_part PARTITION (ds='2008-04-08', hr='11') SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10;
INSERT INTO g707_part PARTITION (ds='2008-04-08', hr='12') SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 20;
INSERT INTO g707_part PARTITION (ds='2008-04-09', hr='11') SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 20;
ALTER TABLE g707_part ARCHIVE PARTITION (ds='2008-04-08');
SELECT ds, hr, count(*) AS n, sum(k) AS sk FROM g707_part GROUP BY ds, hr;
