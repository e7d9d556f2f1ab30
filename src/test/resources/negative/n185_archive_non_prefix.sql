-- reference ArchiveUtils.java:78-79 + ErrorMsg 10125: a partial ARCHIVE
-- spec must name a LEADING PREFIX of the partition columns in declared
-- order — ARCHIVE PARTITION (hr=...) on a (ds, hr) table cannot name a
-- single har directory and is refused.
-- ERROR-CONTAINS: not the same as
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_pfx;
CREATE TABLE neg_arch_pfx (v STRING, ds STRING, hr STRING) USING parquet PARTITIONED BY (ds, hr);
INSERT INTO neg_arch_pfx PARTITION (ds='d1', hr='h1') VALUES ('a');
ALTER TABLE neg_arch_pfx ARCHIVE PARTITION (hr='h1');
