-- archive_multi.q's closing act: UNARCHIVE restores the standard layout
-- and the table answers identically — and accepts writes again (the
-- INSERT after UNARCHIVE would have been refused while archived,
-- clientnegative/archive_insert1.q).
set hive.archive.enabled=true;
DROP TABLE IF EXISTS g708_part;
CREATE TABLE g708_part (k INT, v STRING, ds STRING, hr STRING) USING parquet PARTITIONED BY (ds, hr);
INSERT INTO g708_part PARTITION (ds='2008-04-08', hr='11') SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10;
INSERT INTO g708_part PARTITION (ds='2008-04-08', hr='12') SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 20;
ALTER TABLE g708_part ARCHIVE PARTITION (ds='2008-04-08');
ALTER TABLE g708_part UNARCHIVE PARTITION (ds='2008-04-08');
INSERT INTO g708_part PARTITION (ds='2008-04-08', hr='11') VALUES (100, 'post_unarchive');
SELECT ds, hr, count(*) AS n, sum(k) AS sk FROM g708_part GROUP BY ds, hr;
