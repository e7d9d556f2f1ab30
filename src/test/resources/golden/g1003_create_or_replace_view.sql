-- create_or_replace_view.q: the view-partition lifecycle — replace an
-- unpartitioned view with a PARTITIONED ON definition, ADD two
-- partitions, SHOW them, query through the view, DROP both partitions,
-- and only THEN replace the definition again (replacement while
-- partitions exist is the 10217 refusal, negative n294).
DROP VIEW IF EXISTS g1003_v;
DROP TABLE IF EXISTS g1003_srcpart;
CREATE TABLE g1003_srcpart (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING, hr STRING);
INSERT INTO g1003_srcpart PARTITION (ds='2008-04-08', hr='11')
  VALUES ('k1', 'val_409');
INSERT INTO g1003_srcpart PARTITION (ds='2008-04-08', hr='12')
  VALUES ('k2', 'val_500');
CREATE VIEW g1003_v AS SELECT * FROM g1003_srcpart;
CREATE OR REPLACE VIEW g1003_v PARTITIONED ON (ds, hr)
  AS SELECT * FROM g1003_srcpart;
ALTER VIEW g1003_v ADD PARTITION (ds='2008-04-08', hr='11');
ALTER VIEW g1003_v ADD PARTITION (ds='2008-04-08', hr='12');
SHOW PARTITIONS g1003_v;
ALTER VIEW g1003_v DROP PARTITION (ds='2008-04-08', hr='11');
ALTER VIEW g1003_v DROP PARTITION (ds='2008-04-08', hr='12');
CREATE OR REPLACE VIEW g1003_v PARTITIONED ON (ds, hr)
  AS SELECT value, ds, hr FROM g1003_srcpart;
SELECT value, ds, hr FROM g1003_v
WHERE value = 'val_409' AND ds = '2008-04-08' AND hr = '11'
