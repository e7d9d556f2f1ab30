-- reference: ql/src/test/queries/clientnegative/archive_insert2.q —
-- INSERT INTO (append form) against an archived partition refuses the
-- same way the OVERWRITE form does.
-- ERROR-CONTAINS: conflict with existing archive
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_ins2;
CREATE TABLE neg_arch_ins2 (v STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO neg_arch_ins2 PARTITION (ds='d1') VALUES ('a');
ALTER TABLE neg_arch_ins2 ARCHIVE PARTITION (ds='d1');
INSERT INTO neg_arch_ins2 PARTITION (ds='d1') VALUES ('b');
