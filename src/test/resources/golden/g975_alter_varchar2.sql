-- alter_varchar2.q: varchar CHANGE COLUMN on a PARTITIONED table is
-- metadata-only — narrowing varchar(255)→varchar(10) truncates the
-- READ VIEW of the pre-existing partition's longer values (the data
-- files never rewrite), and a partition inserted AFTER the change
-- writes under the new length.
DROP TABLE IF EXISTS g975_av2;
CREATE TABLE g975_av2 (c1 VARCHAR(255))
  USING parquet PARTITIONED BY (hr INT);
INSERT OVERWRITE TABLE g975_av2 PARTITION (hr=1)
  SELECT concat('value_', n_name) FROM nation
  WHERE n_nationkey = 12;
ALTER TABLE g975_av2 CHANGE COLUMN c1 c1 VARCHAR(10);
INSERT OVERWRITE TABLE g975_av2 PARTITION (hr=2)
  SELECT CAST(n_nationkey AS STRING) FROM nation WHERE n_nationkey = 23;
SELECT hr, c1, length(c1) AS len FROM g975_av2 ORDER BY hr
