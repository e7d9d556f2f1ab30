-- add_part_multiple.q: one ALTER TABLE ADD adding multiple partitions
-- (with IF NOT EXISTS), inserts into two of them, SHOW PARTITIONS is the
-- golden surface.
DROP TABLE IF EXISTS g458_p;
CREATE TABLE g458_p (key INT) PARTITIONED BY (ds STRING);
ALTER TABLE g458_p ADD IF NOT EXISTS
  PARTITION (ds='2010-01-01')
  PARTITION (ds='2010-02-01')
  PARTITION (ds='2010-03-01');
INSERT INTO g458_p PARTITION (ds='2010-01-01') VALUES (1), (2);
INSERT INTO g458_p PARTITION (ds='2010-03-01') VALUES (3);
SELECT ds, count(*) AS n FROM g458_p GROUP BY ds
