-- reference HiveConf hive.archive.enabled defaults FALSE; DDLTask
-- refuses with ErrorMsg 10107 ("Archiving methods are currently
-- disabled") — an era script that forgot the SET must not silently
-- no-op into a state UNARCHIVE later can't see.
-- ERROR-CONTAINS: currently disabled
set hive.archive.enabled=false;
DROP TABLE IF EXISTS neg_arch_dis;
CREATE TABLE neg_arch_dis (v STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO neg_arch_dis PARTITION (ds='d1') VALUES ('a');
ALTER TABLE neg_arch_dis ARCHIVE PARTITION (ds='d1');
