-- ppd_union_view.q: a view UNIONing an old keymap-joined layout with a
-- new direct layout, filtered by the partition key — the ds predicate
-- must prune into EVERY branch (scan only the matching partitions).
DROP VIEW IF EXISTS g849_v;
DROP TABLE IF EXISTS g849_new;
DROP TABLE IF EXISTS g849_old;
DROP TABLE IF EXISTS g849_map;
CREATE TABLE g849_new (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT INTO g849_new PARTITION (ds='2011-10-15') VALUES ('key1', 'value1');
INSERT INTO g849_new PARTITION (ds='2011-10-16') VALUES ('key2', 'value2');
CREATE TABLE g849_old (keymap STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT INTO g849_old PARTITION (ds='2011-10-13') VALUES ('keymap3', 'value3');
INSERT INTO g849_old PARTITION (ds='2011-10-14') VALUES ('keymap4', 'value4');
CREATE TABLE g849_map (key STRING, keymap STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT INTO g849_map PARTITION (ds='2011-10-13') VALUES ('key3', 'keymap3');
INSERT INTO g849_map PARTITION (ds='2011-10-14') VALUES ('key4', 'keymap4');
CREATE VIEW g849_v PARTITIONED ON (ds) AS
SELECT key, value, ds FROM (
  SELECT o.value AS value, m.key AS key, o.ds AS ds
  FROM g849_old o JOIN g849_map m ON o.keymap = m.keymap AND o.ds = m.ds
  UNION ALL
  SELECT value, key, ds FROM g849_new
) subq;
SELECT key, value, ds FROM g849_v WHERE ds = '2011-10-13'
UNION ALL
SELECT key, value, ds FROM g849_v WHERE ds = '2011-10-16'
