-- add_part_exist.q: ADD PARTITION / ADD IF NOT EXISTS (idempotent) /
-- multi-partition ADD in one statement, in the default and a
-- non-default database; SHOW PARTITIONS reflects each step.
DROP TABLE IF EXISTS g895_apt;
CREATE TABLE g895_apt (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
ALTER TABLE g895_apt ADD PARTITION (ds='2010-01-01');
ALTER TABLE g895_apt ADD IF NOT EXISTS PARTITION (ds='2010-01-01');
ALTER TABLE g895_apt ADD IF NOT EXISTS PARTITION (ds='2010-01-02');
ALTER TABLE g895_apt ADD IF NOT EXISTS PARTITION (ds='2010-01-01')
  PARTITION (ds='2010-01-02') PARTITION (ds='2010-01-03');
SHOW PARTITIONS g895_apt
