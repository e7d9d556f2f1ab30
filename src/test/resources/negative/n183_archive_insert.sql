-- reference: ql/src/test/queries/clientnegative/archive_insert1.q —
-- INSERT OVERWRITE into an archived partition fails at compile time
-- ("Insert conflict with existing archive: <spec>").
-- ERROR-CONTAINS: conflict with existing archive
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_ins;
CREATE TABLE neg_arch_ins (v STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO neg_arch_ins PARTITION (ds='d1') VALUES ('a');
ALTER TABLE neg_arch_ins ARCHIVE PARTITION (ds='d1');
INSERT OVERWRITE TABLE neg_arch_ins PARTITION (ds='d1') SELECT 'b';
