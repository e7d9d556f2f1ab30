-- alter2.q: ADD PARTITION with an explicit LOCATION next to a
-- default-located one — SHOW PARTITIONS tracks both regardless of
-- where their storage lives.
DROP TABLE IF EXISTS g872_alter2;
CREATE TABLE g872_alter2 (a INT, b INT)
  USING parquet PARTITIONED BY (insertdate STRING);
ALTER TABLE g872_alter2 ADD PARTITION (insertdate='2008-01-01')
  LOCATION '/tmp/g872_alter2/2008/01/01';
ALTER TABLE g872_alter2 ADD PARTITION (insertdate='2008-01-02');
INSERT INTO g872_alter2 PARTITION (insertdate='2008-01-02') VALUES (1, 2);
SHOW PARTITIONS g872_alter2
