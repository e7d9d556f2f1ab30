-- reference: ql/src/test/queries/clientnegative/archive_multi3.q —
-- archiving a LEAF under an already-archived PREFIX is refused (the
-- partition already sits inside a har).
-- ERROR-CONTAINS: already archived
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_fine;
CREATE TABLE neg_arch_fine (v STRING, ds STRING, hr STRING) USING parquet PARTITIONED BY (ds, hr);
INSERT INTO neg_arch_fine PARTITION (ds='d1', hr='h1') VALUES ('a');
ALTER TABLE neg_arch_fine ARCHIVE PARTITION (ds='d1');
ALTER TABLE neg_arch_fine ARCHIVE PARTITION (ds='d1', hr='h1');
