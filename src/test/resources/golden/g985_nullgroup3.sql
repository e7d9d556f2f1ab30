-- nullgroup3.q: count(1) over a partitioned table where one partition
-- holds data and another is EMPTY (and a twin table where every
-- partition is empty) — empty partitions contribute zero, an all-empty
-- table counts 0.
DROP TABLE IF EXISTS g985_p1;
DROP TABLE IF EXISTS g985_p2;
CREATE TABLE g985_p1 (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT OVERWRITE TABLE g985_p1 PARTITION (ds='2008-04-09')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation;
INSERT OVERWRITE TABLE g985_p1 PARTITION (ds='2008-04-08')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE 1 = 0;
CREATE TABLE g985_p2 (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT OVERWRITE TABLE g985_p2 PARTITION (ds='2008-04-09')
  SELECT CAST(n_nationkey AS STRING), n_name FROM nation WHERE 1 = 0;
SELECT (SELECT count(1) FROM g985_p1) AS filled,
       (SELECT count(1) FROM g985_p2) AS empty
