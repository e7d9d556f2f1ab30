-- reference: ql/src/test/queries/clientnegative/archive_multi1.q —
-- archiving a partition (or anything overlapping an existing archive)
-- twice fails: "Partition(s) already archived".
-- ERROR-CONTAINS: already archived
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_twice;
CREATE TABLE neg_arch_twice (v STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO neg_arch_twice PARTITION (ds='d1') VALUES ('a');
ALTER TABLE neg_arch_twice ARCHIVE PARTITION (ds='d1');
ALTER TABLE neg_arch_twice ARCHIVE PARTITION (ds='d1');
