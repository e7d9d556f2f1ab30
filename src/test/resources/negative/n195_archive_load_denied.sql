-- reference archive contract: LOAD DATA into an archived partition is a
-- write against the har — refused until UNARCHIVE (archive_insert family).
-- ERROR-CONTAINS: conflict with existing archive
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_load;
CREATE TABLE neg_arch_load (v STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO neg_arch_load PARTITION (ds='d1') VALUES ('a');
ALTER TABLE neg_arch_load ARCHIVE PARTITION (ds='d1');
LOAD DATA LOCAL INPATH '/tmp/no_matter.txt' INTO TABLE neg_arch_load PARTITION (ds='d1');
