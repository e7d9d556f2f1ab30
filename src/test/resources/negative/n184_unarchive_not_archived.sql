-- reference DDLTask.unarchive: UNARCHIVE of a partition that is not
-- archived (or was archived at a coarser granularity) is an error, not
-- a no-op — the har the statement promises to unpack does not exist.
-- ERROR-CONTAINS: not archived
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_un;
CREATE TABLE neg_arch_un (v STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO neg_arch_un PARTITION (ds='d1') VALUES ('a');
ALTER TABLE neg_arch_un UNARCHIVE PARTITION (ds='d1');
